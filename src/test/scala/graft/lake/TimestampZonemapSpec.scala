package graft.lake

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Timestamp zonemap/value-set stats must prune identically whatever the
  * reader's or writer's session timezone is: stats are rendered as epoch
  * micros at write time (zone-independent), and the probe compares micros.
  * A zone-dependent rendering would silently DROP fragments containing
  * matches when writer and reader zones differ — pruned fragments are
  * never re-checked by residual filters. */
class TimestampZonemapSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-tz-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType)))

  private def batch(ids: Seq[Long], instants: Seq[String]) = {
    val data = new java.util.ArrayList[Row]()
    ids.zip(instants).foreach { case (i, s) =>
      data.add(Row(i, Timestamp.from(Instant.parse(s))))
    }
    spark.createDataFrame(data, schema).coalesce(1)
  }

  private def withTz[A](tz: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("pruning is correct and exact across writer/reader timezone changes") {
    val root = tmpDir()
    // writer session: Los Angeles
    val ds = withTz("America/Los_Angeles") {
      val d = LakeDataset.create(spark, root, schema)
      d.append(batch(Seq(1L, 2L),
        Seq("2021-01-01T10:00:00Z", "2021-01-01T11:00:00Z")))
      d.append(batch(Seq(3L, 4L),
        Seq("2021-06-01T10:00:00Z", "2021-06-01T11:00:00Z")))
      d
    }
    assert(ds.manifest.fragments.size == 2)
    // reader session: Tokyo (UTC+9). 2021-01-01T10:00:00Z renders there as
    // 2021-01-01 19:00:00 — a zone-dependent stat string would compare the
    // 19:00 literal against an LA-rendered "02:00" stat and mis-prune.
    withTz("Asia/Tokyo") {
      val reader = LakeDataset.open(spark, root)
      // range probe: only the June fragment may hold ts >= June
      assert(reader.prunedFileCount("ts >= timestamp'2021-06-01 00:00:00'") == 1)
      // the January instant, spelled in Tokyo local time
      assert(reader.prunedFileCount("ts = timestamp'2021-01-01 19:00:00'") == 1)
      // correctness through the scanner (pruned fragments are never
      // re-filtered — a wrong prune would lose this row)
      assert(reader.scanner()
        .withFilter("ts = timestamp'2021-01-01 19:00:00'")
        .build().collect().map(_.getLong(0)).toSeq == Seq(1L))
      assert(reader.scanner()
        .withFilter("ts >= timestamp'2021-06-01 00:00:00'")
        .build().count() == 2)
    }
    // equality at micros granularity prunes exactly even in a third zone
    withTz("Europe/Berlin") {
      val reader = LakeDataset.open(spark, root)
      assert(reader.prunedFileCount("ts = timestamp'2021-06-01 12:00:00'") == 1)
      assert(reader.scanner()
        .withFilter("ts = timestamp'2021-06-01 12:00:00'")
        .build().collect().map(_.getLong(0)).toSeq == Seq(3L))
    }
  }

  test("value-set index over timestamps probes zone-independently") {
    val root = tmpDir()
    val ds = withTz("America/Los_Angeles") {
      val d = LakeDataset.create(spark, root, schema)
      d.append(batch(Seq(1L), Seq("2022-03-01T00:00:00Z")))
      d.append(batch(Seq(2L), Seq("2022-09-01T00:00:00Z")))
      d.enableValueSetIndex(Seq("ts"))
      d
    }
    assert(ds.manifest.fragments.forall(_.valueSets.nonEmpty))
    withTz("Asia/Kolkata") { // UTC+5:30 — a half-hour zone
      val reader = LakeDataset.open(spark, root)
      // 2022-03-01T00:00:00Z == 2022-03-01 05:30:00 in Kolkata
      assert(reader.prunedFileCount("ts = timestamp'2022-03-01 05:30:00'") == 1)
      assert(reader.scanner()
        .withFilter("ts = timestamp'2022-03-01 05:30:00'")
        .build().collect().map(_.getLong(0)).toSeq == Seq(1L))
      // an instant in neither fragment prunes everything
      assert(reader.prunedFileCount("ts = timestamp'2022-05-05 05:30:00'") == 0)
    }
  }
}
