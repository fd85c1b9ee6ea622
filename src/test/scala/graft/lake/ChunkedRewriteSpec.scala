package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Job-level chunking of copy-on-write DELETE/UPDATE (SCALE.md "what breaks
  * first" #1): touched fragments are rewritten in bounded-row groups — each
  * its own Spark job — but all land in ONE atomic commit. */
class ChunkedRewriteSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-chunked-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType)))

  private def rows(r: (Long, Double)*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach { case (i, s) => data.add(Row(i, s)) }
    spark.createDataFrame(data, schema)
  }

  private def withGroupRows[A](n: Long)(body: => A): A =
    try {
      spark.conf.set("spark.graft.dml.rewriteGroupRows", n.toString)
      body
    } finally spark.conf.unset("spark.graft.dml.rewriteGroupRows")

  test("whole-table update splits into per-group jobs, commits once") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    (0 until 4).foreach { k =>
      ds.append(rows((k * 10L, 1.0), (k * 10L + 1, 2.0), (k * 10L + 2, 3.0)))
    }
    val vBefore = ds.version
    val ridsBefore = ds.scanner().withRowId.build()
      .select("id", "_rowid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 fragments × 3 rows, groups capped at 3 rows → 4 groups, each
    // staged by its own job; every group yields ≥1 fragment
    val matched = withGroupRows(3) { ds.update("score < 10", Map("score" -> "score + 100")) }
    assert(matched == 12)
    assert(ds.version == vBefore + 1, "chunked rewrite must commit exactly once")
    assert(ds.manifest.fragments.size >= 4)
    assert(ds.manifest.fragments.map(_.id).distinct.size ==
      ds.manifest.fragments.size, "fragment ids must stay unique across groups")
    val after = ds.scanner().withRowId.build()
      .select("id", "score", "_rowid").collect()
    assert(after.length == 12)
    assert(after.forall(_.getDouble(1) > 100))
    // stable rowids survive the grouped rewrite
    after.foreach(r => assert(ridsBefore(r.getLong(0)) == r.getLong(2)))
  }

  test("grouped delete keeps 3VL semantics and drops only matching rows") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    (0 until 3).foreach { k =>
      ds.append(rows((k * 10L, k.toDouble), (k * 10L + 1, k + 0.5)))
    }
    // a NULL-evaluating row must survive (delete only where pred IS TRUE)
    ds.append(spark.createDataFrame(
      java.util.List.of(Row(99L, null)), schema))
    val deleted = withGroupRows(2) { ds.delete("score < 1.0") }
    assert(deleted == 2) // 0.0 and 0.5
    val left = ds.read().select("id").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(10L, 11L, 20L, 21L, 99L))
  }

  test("a failing later group aborts cleanly: no commit, no orphan files") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    (0 until 4).foreach { k =>
      ds.append(rows((k * 10L, 1.0), (k * 10L + 1, 2.0), (k * 10L + 2, 3.0)))
    }
    val vBefore = ds.version
    val dataDir = java.nio.file.Paths.get(ds.root).resolve("data")
    def dataFiles() = java.nio.file.Files.list(dataDir).count()
    val filesBefore = dataFiles()
    // rows in the LAST fragment blow up at rewrite time: earlier groups
    // stage successfully first, then the abort must clean them up
    val ex = intercept[Exception] {
      withGroupRows(3) {
        ds.update("score < 10", Map("score" ->
          ("CASE WHEN id >= 30 THEN CAST(raise_error('boom') AS DOUBLE) " +
            "ELSE score + 100 END")))
      }
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("; ")
    assert(msgs.contains("boom"), msgs)
    assert(ds.version == vBefore, "no commit may land on abort")
    assert(ds.read().collect().forall(_.getDouble(1) < 10),
      "no partial update may be visible")
    // cleanup is bounded-async: killed tasks can flush _temporary files
    // after the abort's delete pass (the retry loop in stageFragments
    // re-deletes, but under suite-parallel load a zombie task can outlive
    // it). The contract is no commit + eventual cleanup — vacuum collects
    // any straggler stage dir — so poll briefly instead of racing.
    val deadline = System.currentTimeMillis() + 15000
    var files = dataFiles()
    while (files != filesBefore && System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      java.nio.file.Files.list(dataDir).forEach { p =>
        if (p.getFileName.toString.startsWith("stage-")) {
          try graft.lake.LakeIO.forRoot(ds.root,
            spark.sparkContext.hadoopConfiguration)
            .deleteRecursive(new org.apache.hadoop.fs.Path(p.toString))
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
      files = dataFiles()
    }
    assert(files == filesBefore,
      "staged group files must be deleted on abort (after settling)")
  }

  test("grouped mergeInsert: bounded jobs, one commit, unique fragment ids") {
    import org.apache.spark.sql.functions.col
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    (0 until 3).foreach { k =>
      ds.append(rows((k * 10L, 1.0), (k * 10L + 1, 2.0)))
    }
    val vBefore = ds.version
    // source updates one row in EVERY fragment and inserts two new keys —
    // exercises rewrite groups AND the insert stage in one commit
    val src = rows((0, 50.0), (10, 50.0), (20, 50.0), (99, 9.0), (98, 8.0))
    val (matched, inserted) = withGroupRows(2) {
      ds.mergeInsert(src, Seq("id"))
    }
    assert(matched == 3 && inserted == 2)
    assert(ds.version == vBefore + 1, "merge must commit exactly once")
    val ids = ds.manifest.fragments.map(_.id)
    assert(ids.distinct.size == ids.size,
      s"fragment ids must be unique after rewrite+insert merge: $ids")
    val after = ds.read().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after.size == 8)
    assert(after(0L) == 50.0 && after(10L) == 50.0 && after(20L) == 50.0)
    assert(after(99L) == 9.0 && after(98L) == 8.0)
    assert(after(1L) == 2.0, "unmatched rows unchanged")
    // rowids still unique (stable-rowid invariant intact)
    val rids = ds.scanner().withRowId.build()
      .select(col("_rowid")).collect().map(_.getLong(0))
    assert(rids.distinct.length == rids.length)
  }

  test("group sizing: single group when under the bound (fast path intact)") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, 1.0), (2, 2.0)))
    val vBefore = ds.version
    assert(ds.update("id = 1", Map("score" -> "0.0")) == 1)
    assert(ds.version == vBefore + 1)
    assert(ds.read().filter("id = 1").collect().head.getDouble(1) == 0.0)
  }
}
