package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver testdata's `events.ts` has shipped as BOTH timestamp[ns]
  * (read as nanos-long under the legacy conf) and timestamp[us] (read as
  * TIMESTAMP_NTZ): Tables.load must map either physical encoding to the
  * same microsecond TimestampType instants, or every events-based query
  * breaks on the next regeneration (9 did, once). */
class TablesSpec extends SparkTestBase {

  test("events.ts: nanos-long and native-timestamp encodings load alike") {
    import spark.implicits._
    val micros = Seq(1700000000123456L, 1700000999000001L, 0L)

    // encoding A: BIGINT epoch nanos (what nanosAsLong yields for ts[ns])
    val dirA = Files.createTempDirectory("events-ns-").toString
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")

    // encoding B: native TIMESTAMP_NTZ micros (current driver generation)
    val dirB = Files.createTempDirectory("events-us-").toString
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    def loaded(dir: String): Map[Long, Long] =
      Tables.load(spark, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val a = loaded(dirA)
    val b = loaded(dirB)
    assert(a == b, s"encodings diverge: $a vs $b")
    assert(a.values.toSet == micros.toSet)
    // both load to TimestampType (not NTZ, not long)
    Seq(dirA, dirB).foreach { d =>
      val dt = Tables.load(spark, d, "events").schema("ts").dataType
      assert(dt == TimestampType, s"$d loaded ts as $dt")
    }
  }
}
