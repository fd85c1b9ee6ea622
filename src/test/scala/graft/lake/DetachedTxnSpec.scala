package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Persisted detached transactions (reference detached_txn.go): phase-1
  * work survives a "restart" (fresh handle), commits later through the
  * matrix-checked paths, lists/reports status, and expires cleanly. */
class DetachedTxnSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-detached-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def rows(r: (Long, String, Double)*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach { case (i, n, s) => data.add(Row(i, n, s)) }
    spark.createDataFrame(data, schema).coalesce(1)
  }

  test("detached append: durable, invisible until commit, listable") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a", 1.0)))
    val id = ds.createDetachedAppend(rows((2, "b", 2.0)))
    assert(ds.detachedStatus(id) == "pending")
    assert(ds.read().count() == 1) // phase 1 invisible
    // "restart": a fresh handle sees and commits the pending txn
    val ds2 = LakeDataset.open(spark, root)
    assert(ds2.listDetached().map(_.id) == Seq(id))
    assert(ds2.commitDetached(id) == 1)
    assert(ds2.read().count() == 2)
    assert(ds2.detachedStatus(id) == "unknown")
    intercept[IllegalArgumentException](ds2.commitDetached(id))
  }

  test("detached delete commits later; fragment ids renumbered safely") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val id = ds.createDetachedDelete("id = 1")
    // an append lands in between (claims fresh fragment ids)
    ds.append(rows((3, "c", 3.0)))
    assert(ds.commitDetached(id) == 1)
    assert(ds.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 3L))
    // fragment ids remain unique after the interleaved commit
    val ids = ds.manifest.fragments.map(_.id)
    assert(ids.distinct.length == ids.length)
  }

  test("detached overwrite replaces content at commit time") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a", 1.0)))
    val id = ds.createDetachedOverwrite(rows((9, "z", 9.0)))
    ds.append(rows((2, "b", 2.0))) // still visible pre-commit
    assert(ds.read().count() == 2)
    assert(ds.commitDetached(id) == 1)
    assert(ds.read().collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("detached delete conflicts when its fragments were rewritten") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val id = ds.createDetachedDelete("id = 1")
    // a live delete rewrites the SAME fragment before phase 2
    assert(ds.delete("id = 2") == 1)
    intercept[CommitConflictException](ds.commitDetached(id))
    // the intent survives the failed commit attempt and data is intact
    assert(ds.detachedStatus(id) == "pending")
    assert(ds.read().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("vacuum keeps pending detached files; cleanup expires intents") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a", 1.0)))
    val id = ds.createDetachedAppend(rows((2, "b", 2.0)))
    // even with zero grace, staged files referenced by a pending txn stay
    ds.vacuum(keepVersions = 1, graceMs = 0L)
    assert(ds.commitDetached(id) == 1)
    assert(ds.read().count() == 2)
    // expired intents are dropped; their files become vacuumable garbage
    val id2 = ds.createDetachedAppend(rows((3, "c", 3.0)))
    assert(ds.cleanupExpiredDetached(olderThanMs = 0L) == 1)
    assert(ds.detachedStatus(id2) == "unknown")
    assert(ds.vacuum(keepVersions = 1, graceMs = 0L) >= 1)
    assert(ds.read().count() == 2)
  }

  test("deleteDetached aborts a staged txn explicitly") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0)))
    val id = ds.createDetachedAppend(rows((2, "b", 2.0)))
    assert(ds.deleteDetached(id))
    assert(ds.detachedStatus(id) == "unknown")
    assert(!ds.deleteDetached(id)) // idempotent: already gone
    intercept[IllegalArgumentException] { ds.commitDetached(id) }
    assert(ds.read().count() == 1)
    // the aborted txn's staged files are vacuumable garbage
    assert(ds.vacuum(keepVersions = 1, graceMs = 0L) >= 1)
  }

  test("take(): random access by stable rowid, projected and pruned") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    ds.append(rows((3, "c", 3.0), (4, "d", 4.0)))
    val ids = ds.read().count() // 4 rows, rowids 0..3
    assert(ids == 4)
    val got = ds.take(Seq(0L, 3L)).collect()
      .map(r => (r.getAs[Long]("_rowid"), r.getAs[Long]("id"))).toSet
    assert(got == Set((0L, 1L), (3L, 4L)))
    // projection keeps only asked columns (+ rowid)
    val proj = ds.take(Seq(1L), columns = Seq("name"))
    assert(proj.columns.toSeq == Seq("name", "_rowid"))
    assert(proj.head().getString(0) == "b")
    // rowids survive compaction — take() still resolves the same rows
    ds.compact()
    assert(ds.take(Seq(3L)).head().getAs[Long]("id") == 4L)
  }
}
