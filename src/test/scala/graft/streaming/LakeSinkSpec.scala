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

  test("dedup sink drops duplicates across restarts with fresh checkpoints") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir()

    // first query run lands events 1..3
    val s1 = MemoryStream[EventStream.Event]
    val q1 = s1.toDF().writeStream
      .foreachBatch(LakeSink.dedupAppendTo(root, Seq("event_id"), "dd"))
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      s1.addData(ev(1, 100, 1), ev(2, 200, 1), ev(2, 200, 1)) // in-batch dup
      q1.processAllAvailable()
      s1.addData(ev(3, 300, 2), ev(1, 100, 1)) // cross-batch dup
      q1.processAllAvailable()
    } finally q1.stop()
    assert(LakeDataset.open(spark, root).read().count() == 3)

    // SECOND query run, FRESH checkpoint (batch ids restart at 0):
    // dropDuplicates state is gone, but the lake anti-join still holds
    val s2 = MemoryStream[EventStream.Event]
    val q2 = s2.toDF().writeStream
      .foreachBatch(LakeSink.dedupAppendTo(root, Seq("event_id"), "dd2"))
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      s2.addData(ev(2, 200, 1), ev(4, 400, 2)) // 2 already in the table
      q2.processAllAvailable()
    } finally q2.stop()

    val ds = LakeDataset.open(spark, root)
    assert(ds.read().select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("dedup append rebuilds the anti-join when a concurrent commit races it") {
    import spark.implicits._
    val root = tmpDir()
    val b0 = Seq(ev(1, 100, 1)).toDF()
    val ds1 = LakeDataset.create(spark, root, b0.schema)

    // ds2 opens a handle BEFORE ds1's commit: its manifest snapshot is
    // stale, exactly the state a second query racing the first would see
    val ds2 = LakeDataset.open(spark, root)
    assert(ds1.dedupAppendStreamingBatch(b0, Seq("event_id"), "qa", 0L))

    // ds2's in-body anti-join initially runs against the stale (empty)
    // snapshot, so event 1 passes it — but the commit CAS fails against
    // ds1's already-published version, the retry refreshes the manifest,
    // and the anti-join is rebuilt: event 1 must NOT land twice
    val b1 = Seq(ev(1, 100, 1), ev(2, 200, 2)).toDF()
    assert(ds2.dedupAppendStreamingBatch(b1, Seq("event_id"), "qb", 0L))

    val ids = LakeDataset.open(spark, root).read()
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L), s"duplicate landed: $ids")
  }

  test("upsert sink applies updates exactly once; replays are skipped") {
    import spark.implicits._
    val root = tmpDir()
    val b0 = Seq(ev(1, 100, 1), ev(2, 200, 1)).toDF()
    val ds = LakeDataset.create(spark, root, b0.schema)
    val sink = LakeSink.upsertTo(root, Seq("event_id"), "up")

    sink(b0, 0L)
    // batch 1 updates event 2's user and inserts event 3
    sink(Seq(ev(2, 200, 9), ev(3, 300, 2)).toDF(), 1L)
    val after = LakeDataset.open(spark, root).read()
      .select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 9L, 3L -> 2L))

    // replay of batch 1 with DIFFERENT (stale) content must be skipped
    sink(Seq(ev(2, 200, 777)).toDF(), 1L)
    val after2 = LakeDataset.open(spark, root).read()
      .select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2 == after)

    // an empty (no-op) batch still advances the high-water mark
    sink(Seq.empty[EventStream.Event].toDF(), 2L)
    val ds2 = LakeDataset.open(spark, root)
    assert(ds2.manifest.properties("streaming.up.lastBatchId") == "2")
    assert(!ds2.upsertStreamingBatch(
      Seq(ev(9, 900, 9)).toDF(), Seq("event_id"), "up", 2L))
  }

  test("withMvRefresh keeps a materialized view current with the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir()
    val viewRoot = s"${tmpDir()}/view"

    // batch 0 lands through the plain sink, then the MV is defined on it
    val s1 = MemoryStream[EventStream.Event]
    val q1 = s1.toDF().writeStream
      .foreachBatch(LakeSink.appendTo(root, "mvq"))
      .option("checkpointLocation", tmpDir()).start()
    try {
      s1.addData(ev(1, 100, 1), ev(2, 200, 2))
      q1.processAllAvailable()
    } finally q1.stop()
    val base = LakeDataset.open(spark, root)
    graft.lake.MaterializedView.create(spark, base, viewRoot,
      keys = Seq("user_id"), sumCols = Seq("value"))

    // later batches flow through the wrapped sink: ingest + MV refresh
    val s2 = MemoryStream[EventStream.Event]
    val q2 = s2.toDF().writeStream
      .foreachBatch(LakeSink.withMvRefresh(
        LakeSink.appendTo(root, "mvq2"), Seq(viewRoot)))
      .option("checkpointLocation", tmpDir()).start()
    try {
      s2.addData(ev(3, 300, 1), ev(4, 400, 3))
      q2.processAllAvailable()
      s2.addData(ev(5, 500, 3))
      q2.processAllAvailable()
    } finally q2.stop()

    val mv = graft.lake.MaterializedView.open(spark, viewRoot)
    assert(mv.baseVersion == base.refresh().version)
    val got = mv.read().orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 2.0), (2L, 1L, 1.0), (3L, 2L, 2.0)))
    // replayed-batch skip leaves the cursor at the head: refresh is free
    assert(mv.refresh().upsertedGroups == 0L)
  }
}
