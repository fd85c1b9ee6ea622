package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import graft.lake.LakeDataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingest into the lake: micro-batches become versioned commits,
  * batch replays are idempotent (exactly-once table state). */
class LakeSinkSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-sink-").toString

  private def ev(id: Long, t: Long, u: Long): EventStream.Event =
    EventStream.Event(id, new Timestamp(t * 1000), u, "click", 1.0)

  test("micro-batches land as commits; replayed batch is skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir()
    val stream = MemoryStream[EventStream.Event]
    val q = stream.toDF().writeStream
      .foreachBatch(LakeSink.appendTo(root, "t1"))
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      stream.addData(ev(1, 100, 1), ev(2, 200, 1))
      q.processAllAvailable()
      stream.addData(ev(3, 300, 2))
      q.processAllAvailable()
    } finally q.stop()

    val ds = LakeDataset.open(spark, root)
    assert(ds.read().count() == 3)
    assert(ds.manifest.properties("streaming.t1.lastBatchId") == "1")

    // simulate a foreachBatch REPLAY of batch 1 after recovery: skipped
    assert(!ds.appendStreamingBatch(ds.read().limit(1), "t1", 1L))
    assert(ds.read().count() == 3)
    // a NEW batch id still lands
    assert(ds.appendStreamingBatch(ds.read().limit(1), "t1", 2L))
    assert(ds.refresh().read().count() == 4)
  }

  test("independent query keys keep independent high-water marks") {
    import spark.implicits._
    val root = tmpDir()
    val df = Seq(ev(10, 100, 1)).toDF()
    val ds = LakeDataset.create(spark, root, df.schema)
    assert(ds.appendStreamingBatch(df, "a", 0L))
    assert(ds.appendStreamingBatch(df, "b", 0L)) // different key, same id
    assert(!ds.appendStreamingBatch(df, "a", 0L))
    assert(ds.read().count() == 2)
  }

  test("sink lands a stream on a branch; main untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir()
    val seed = Seq(ev(1, 100, 1)).toDF()
    val ds = LakeDataset.create(spark, root, seed.schema)
    ds.append(seed.coalesce(1))
    ds.createBranch("ingest")

    val stream = MemoryStream[EventStream.Event]
    val q = stream.toDF().writeStream
      .foreachBatch(LakeSink.appendTo(root, "br", branch = Some("ingest")))
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      stream.addData(ev(2, 200, 1), ev(3, 300, 2))
      q.processAllAvailable()
    } finally q.stop()

    assert(ds.refresh().read().count() == 1) // main frozen
    val br = ds.checkoutBranch("ingest")
    assert(br.read().count() == 3)
    // replay detection lives in the BRANCH manifest
    assert(br.manifest.properties.contains("streaming.br.lastBatchId"))
    ds.mergeBranch("ingest")
    assert(ds.read().count() == 3)
  }
}
