package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.lake.LakeDataset
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types._

/** Streaming read FROM the lake (`readStream.format("lake")`): versions are
  * offsets, the first batch is the snapshot, later batches are the net
  * inserts of the committed range, and non-append commits are refused
  * unless the reader opts into skipChangeCommits. */
class LakeStreamSourceSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-src-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType)))

  private def rows(r: (Long, String)*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach { case (i, n) => data.add(Row(i, n)) }
    spark.createDataFrame(data, schema).coalesce(1)
  }

  test("snapshot then append tail, exactly once across batches") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a"), (2, "b")))

    val q = spark.readStream.format("lake").load(root)
      .writeStream.format("memory").queryName("lake_tail")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_tail").count() == 2) // initial snapshot

      ds.append(rows((3, "c")))
      ds.append(rows((4, "d"), (5, "e")))
      q.processAllAvailable()
      val got = spark.table("lake_tail").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
      assert(spark.table("lake_tail").count() == 5) // no duplicates
    } finally q.stop()
  }

  test("compaction streams through; a delete commit is refused") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a")))

    val q = spark.readStream.format("lake").load(root)
      .writeStream.format("memory").queryName("lake_guard")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      ds.append(rows((2, "b")))
      ds.compact() // net-invisible rewrite: must NOT poison the tail
      ds.append(rows((3, "c")))
      q.processAllAvailable()
      assert(spark.table("lake_guard").count() == 3)

      ds.delete("id = 1")
      ds.append(rows((4, "d")))
      val ex = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("skipChangeCommits")
        || Option(ex.getCause).exists(_.getMessage.contains("skipChangeCommits")))
    } finally q.stop()
  }

  test("mid-stream type evolution trips the schema guard with a remedy") {
    // Round-4 ADVICE: the guard compared field NAMES only, so a widening
    // type change (name-preserving) fell through to the engine's raw
    // attribute-mismatch assertion. Full StructType comparison catches it.
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType))))
    val d1 = new java.util.ArrayList[Row]()
    d1.add(Row(1, "a"))
    ds.append(spark.createDataFrame(d1, ds.schema).coalesce(1))

    val q = spark.readStream.format("lake").load(root)
      .writeStream.format("memory").queryName("lake_type_guard")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_type_guard").count() == 1)
      ds.alterColumnType("id", LongType) // names unchanged, type widened
      val d2 = new java.util.ArrayList[Row]()
      d2.add(Row(2L, "b"))
      ds.append(spark.createDataFrame(d2, ds.schema).coalesce(1))
      val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("; ")
      assert(msgs.contains("schema changed") && msgs.contains("restart"),
        msgs)
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the committed version offset") {
    val root = tmpDir()
    val ckpt = tmpDir()
    val sink = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a")))

    def run(): Unit = {
      val q = spark.readStream.format("lake").load(root)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // snapshot batch
    assert(spark.read.parquet(sink).count() == 1)

    ds.append(rows((2, "b")))
    // a NEW query instance on the same checkpoint: the engine replays the
    // committed offset as SerializedOffset json — the versionOf parse path
    run()
    val got = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"))) // no re-read of the snapshot
  }

  test("lake→stream→lake pipeline: exactly-once end to end across restart") {
    val srcRoot = tmpDir()
    val dstRoot = tmpDir()
    val ckpt = tmpDir()
    val src = LakeDataset.create(spark, srcRoot, schema)
    src.append(rows((1, "a"), (2, "b")))

    def run(): Unit = {
      import org.apache.spark.sql.functions.upper
      val q = spark.readStream.format("lake").load(srcRoot)
        .withColumn("name", upper(org.apache.spark.sql.functions.col("name")))
        .writeStream
        .foreachBatch(LakeSink.appendTo(dstRoot, "pipe"))
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val dst = LakeDataset.open(spark, dstRoot)
    assert(dst.read().collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet == Set((1L, "A"), (2L, "B")))

    // restart the pipeline, append upstream: the source resumes from its
    // checkpointed version AND the sink's batch high-water mark dedupes
    // any replayed micro-batch — exactly-once on both ends
    src.append(rows((3, "c")))
    run()
    run() // an idle extra run must change nothing
    assert(dst.refresh().read().collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "A"), (2L, "B"), (3L, "C")))
  }

  test("skipChangeCommits=true streams net inserts across change commits") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a"), (2, "b")))

    val q = spark.readStream.format("lake")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.format("memory").queryName("lake_skip")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      ds.delete("id = 2")      // dropped silently (opted in)
      ds.append(rows((3, "c")))
      q.processAllAvailable()
      val got = spark.table("lake_skip").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("startingVersion=latest skips the initial snapshot") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "old"), (2, "old")))

    val q = spark.readStream.format("lake")
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("lake_latest")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_latest").count() == 0) // no snapshot
      ds.append(rows((3, "new")))
      q.processAllAvailable()
      val got = spark.table("lake_latest").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((3L, "new"))) // only post-attach commits
    } finally q.stop()
  }

  test("numeric startingVersion tails from that commit, no snapshot") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema) // v1
    ds.append(rows((1, "a"))) // v2
    ds.append(rows((2, "b"))) // v3

    // tail from (exclusive) v2: only v3's rows, never v2's
    val q = spark.readStream.format("lake")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName("lake_from_v2")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("lake_from_v2").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((2L, "b")))
    } finally q.stop()

    // out-of-range startingVersion fails fast with the retained range
    val ex = intercept[Exception] {
      val bad = spark.readStream.format("lake")
        .option("startingVersion", "99").load(root)
        .writeStream.format("memory").queryName("lake_bad_sv")
        .option("checkpointLocation", tmpDir())
        .start()
      try bad.processAllAvailable() finally bad.stop()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("; ")
    assert(msgs.contains("startingVersion"), msgs)
  }

  test("maxVersionsPerTrigger drains a backlog in bounded batches") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a")))

    val q = spark.readStream.format("lake")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.format("memory").queryName("lake_rate")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable() // snapshot batch seeds the rate-limit base
      // backlog of 3 commits while the source is idle
      ds.append(rows((2, "b")))
      ds.append(rows((3, "c")))
      ds.append(rows((4, "d")))
      q.processAllAvailable()
      val got = spark.table("lake_rate").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      // one commit per micro-batch: the 3-commit backlog took 3 data
      // batches after the snapshot (4 non-empty batches total)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 4,
        s"expected 4 rate-limited data batches, saw $dataBatches: " +
          q.recentProgress.map(p => p.batchId -> p.numInputRows).mkString(", "))
    } finally q.stop()
  }

  test("a stream tails a BRANCH independently of main") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a")))
    ds.createBranch("feed")
    val br = ds.checkoutBranch("feed")

    val q = spark.readStream.format("lake")
      .option("branch", "feed").load(root)
      .writeStream.format("memory").queryName("lake_branch_tail")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_branch_tail").count() == 1) // branch snapshot

      br.append(rows((10, "branch-only")))
      ds.append(rows((99, "main-only"))) // must NOT reach the branch stream
      q.processAllAvailable()
      val got = spark.table("lake_branch_tail").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (10L, "branch-only")))
    } finally q.stop()
  }
}
