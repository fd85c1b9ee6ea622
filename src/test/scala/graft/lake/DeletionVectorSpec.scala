package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Merge-on-read deletion vectors (reference deletion_bitmap.go): deletes
  * write rowid tombstones instead of rewriting fragments; reads anti-join
  * them; rewrites fold them in. */
class DeletionVectorSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-dv-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def rows(r: (Long, String, Double)*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach { case (i, n, s) => data.add(Row(i, n, s)) }
    spark.createDataFrame(data, schema).coalesce(1)
  }

  private def fragFiles(ds: LakeDataset) =
    ds.manifest.fragments.map(_.file).toSet

  test("DV delete removes rows without rewriting any fragment") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    val filesBefore = fragFiles(ds)
    val n = ds.delete("id = 2", useDeletionVectors = true)
    assert(n == 1)
    // the data files are untouched; only a tombstone file was added
    assert(fragFiles(ds) == filesBefore)
    assert(ds.manifest.deletionFiles.size == 1)
    assert(ds.manifest.deletedRowCount == 1)
    assert(ds.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))
    // scanner + filters see the same live view
    assert(ds.scanner().withFilter("id >= 1").build().count() == 2)
    // time travel to before the delete still sees the row
    assert(ds.readVersion(ds.version - 1).count() == 3)
    // 3VL: NULL-predicate rows are not deleted
    ds.append(rows((4, "d", 4.0)))
    val data = new java.util.ArrayList[Row]()
    data.add(Row(5L, "e", null))
    ds.append(spark.createDataFrame(data, schema).coalesce(1))
    assert(ds.delete("score > 3.5", useDeletionVectors = true) == 1)
    assert(ds.read().collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
  }

  test("DV delete matching nothing commits nothing") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0)))
    val v = ds.version
    assert(ds.delete("id = 99", useDeletionVectors = true) == 0)
    assert(ds.version == v && ds.manifest.deletionFiles.isEmpty)
  }

  test("rewrites preserve DV semantics; purge folds tombstones in") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    ds.append(rows((3, "c", 3.0), (4, "d", 4.0)))
    ds.delete("id IN (2, 3)", useDeletionVectors = true)
    assert(ds.read().count() == 2)
    // compaction reads the live view and preserves rowids -> still 2 rows
    ds.compact(targetRows = 10)
    assert(ds.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 4L))
    // purge clears the deletion list and physical rows match live rows
    ds.purgeDeletes()
    assert(ds.manifest.deletionFiles.isEmpty)
    assert(ds.manifest.deletedRowCount == 0)
    assert(ds.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 4L))
    assert(ds.manifest.fragments.map(_.rowCount).sum == 2)
    // vacuum reaps the now-unreferenced tombstone files
    val reaped = ds.vacuum(keepVersions = 1, graceMs = 0L)
    assert(reaped >= 1)
    assert(ds.read().count() == 2)
  }

  test("CoW update composes with DV deletes") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    ds.delete("id = 2", useDeletionVectors = true)
    assert(ds.update("id = 3", Map("name" -> "'up'")) == 1)
    val got = ds.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (3L, "up")))
  }

  test("DV deletes are observationally equivalent to CoW deletes") {
    // two identical datasets; the same delete sequence applied MoR vs CoW
    // must agree on reported counts and visible content at every step
    val seed = (0 until 200).map(i =>
      (i.toLong, s"n${i % 7}", (i % 13).toDouble))
    val cow = LakeDataset.create(spark, tmpDir(), schema)
    val mor = LakeDataset.create(spark, tmpDir(), schema)
    cow.append(rows(seed: _*)); mor.append(rows(seed: _*))
    val predicates = Seq(
      "id % 17 = 3",
      "score > 9.0",
      "name = 'n2' AND id < 100",
      "id IN (1, 2, 3, 999)",
      "score IS NULL",
      "id >= 150")
    predicates.foreach { p =>
      val a = cow.delete(p)
      val b = mor.delete(p, useDeletionVectors = true)
      assert(a == b, s"counts differ for '$p': cow=$a mor=$b")
      val ca = cow.read().orderBy("id").collect().map(_.toSeq).toSeq
      val cb = mor.read().orderBy("id").collect().map(_.toSeq).toSeq
      assert(ca == cb, s"content differs after '$p'")
    }
    // folding tombstones in changes nothing observable
    mor.purgeDeletes()
    assert(mor.read().orderBy("id").collect().map(_.toSeq).toSeq ==
      cow.read().orderBy("id").collect().map(_.toSeq).toSeq)
    assert(mor.countRows() == cow.countRows())
  }

  test("concurrent DV deletes both land (tombstones union)") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    val h2 = LakeDataset.open(spark, root)
    assert(h2.delete("id = 1", useDeletionVectors = true) == 1)
    // h1 is stale; its DV delete rebases over h2's
    assert(h1.delete("id = 3", useDeletionVectors = true) == 1)
    assert(h1.refresh().read().collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(h1.manifest.deletionFiles.size == 2)
  }

  test("purge re-plans over a concurrent DV delete instead of losing it") {
    val root = tmpDir()
    val a = LakeDataset.create(spark, root, schema)
    a.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)))
    assert(a.delete("id = 1", useDeletionVectors = true) == 1)
    // `a` plans its purge against [dv1]; `b` lands a second tombstone
    // between a's plan and a's commit (stale-handle interleaving)
    val b = LakeDataset.open(spark, root)
    assert(b.delete("id = 3", useDeletionVectors = true) == 1)
    // without the foldedDeletes guard the purge would rebase, clear the
    // deletion list and resurrect id=3; with it, the purge re-plans from
    // the refreshed manifest and folds BOTH tombstones
    a.purgeDeletes()
    assert(a.manifest.deletionFiles.isEmpty)
    assert(a.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 4L))
    assert(b.refresh().read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 4L))
  }

  test("shallow clone carries deletion vectors (absolutized paths)") {
    val root = tmpDir()
    val src = LakeDataset.create(spark, root, schema)
    src.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    assert(src.delete("id = 2", useDeletionVectors = true) == 1)
    val clone = src.shallowClone(tmpDir())
    // the clone must read THROUGH the source's tombstones, not fail on a
    // clone-relative '_deletes/...' path or resurrect the deleted row
    assert(clone.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))
    // clone-side purge folds them physically without touching the source
    clone.purgeDeletes()
    assert(clone.manifest.deletionFiles.isEmpty)
    assert(clone.read().count() == 2)
    assert(src.refresh().read().count() == 2)
    assert(src.manifest.deletionFiles.size == 1)
  }

  test("restore replays the target version's deletion vectors") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    val vFull = ds.version
    assert(ds.delete("id <= 2", useDeletionVectors = true) == 2)
    val vTombstoned = ds.version
    ds.purgeDeletes()
    assert(ds.manifest.deletionFiles.isEmpty)
    // restore to the tombstoned version: its pre-purge fragments come back
    // WITH its deletion list, so the deleted rows stay deleted
    ds.restore(vTombstoned)
    assert(ds.manifest.deletionFiles.nonEmpty)
    assert(ds.read().collect().map(_.getLong(0)).toSeq == Seq(3L))
    // restore to before the delete: full content, no tombstones
    ds.restore(vFull)
    assert(ds.manifest.deletionFiles.isEmpty)
    assert(ds.read().count() == 3)
  }

  test("overwrite clears the deletion list with the data it replaces") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    assert(ds.delete("id = 1", useDeletionVectors = true) == 1)
    assert(ds.manifest.deletedRowCount == 1)
    ds.overwrite(rows((10, "x", 0.0)))
    assert(ds.manifest.deletionFiles.isEmpty)
    assert(ds.manifest.deletedRowCount == 0)
    assert(ds.read().collect().map(_.getLong(0)).toSeq == Seq(10L))
  }
}
