package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Change data feed derived from manifests + stable rowids: `changes(a, b)`
  * nets row-level inserts/deletes/updates between two versions without a
  * logged feed; `changeLog(a, b)` attributes them per commit. Compaction
  * and layout rewrites must be invisible (same rowid, same values). */
class ChangeFeedSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-cdf-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def rows(r: (Long, String, Double)*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach { case (i, n, s) => data.add(Row(i, n, s)) }
    spark.createDataFrame(data, schema).coalesce(1)
  }

  private def byType(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getAs[String]("_change_type"))
      .view.mapValues(_.map(r => (r.getAs[Long]("id"),
        r.getAs[String]("name"))).toSet).toMap

  test("append → insert rows; same-version range is empty") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    val v0 = ds.version
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val ch = byType(ds.changes(v0, ds.version))
    assert(ch.keySet == Set("insert"))
    assert(ch("insert") == Set((1L, "a"), (2L, "b")))
    assert(ds.changes(ds.version, ds.version).count() == 0)
  }

  test("copy-on-write delete → delete rows only for the matching rows") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    val v1 = ds.version
    ds.delete("id = 2")
    val ch = byType(ds.changes(v1, ds.version))
    // the fragment was rewritten, but rows 1 and 3 kept rowid + values →
    // only the deleted row surfaces
    assert(ch.keySet == Set("delete"))
    assert(ch("delete") == Set((2L, "b")))
  }

  test("update → pre/post image pair sharing the rowid") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val v1 = ds.version
    ds.update("id = 2", Map("name" -> "upper(name)"))
    val df = ds.changes(v1, ds.version)
    val pre = df.filter("_change_type = 'update_preimage'").collect()
    val post = df.filter("_change_type = 'update_postimage'").collect()
    assert(pre.map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
      .toSeq == Seq((2L, "b")))
    assert(post.map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
      .toSeq == Seq((2L, "B")))
    assert(pre.head.getAs[Long]("_rowid") == post.head.getAs[Long]("_rowid"))
    assert(df.count() == 2)
  }

  test("merge-on-read DV delete → delete rows without fragment rewrite") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    val v1 = ds.version
    ds.delete("id >= 2", useDeletionVectors = true)
    val ch = byType(ds.changes(v1, ds.version))
    assert(ch.keySet == Set("delete"))
    assert(ch("delete") == Set((2L, "b"), (3L, "c")))
  }

  test("compaction and purge are change-invisible; net diff collapses") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0)))
    ds.append(rows((2, "b", 2.0)))
    ds.append(rows((3, "c", 3.0)))
    val vLoaded = ds.version
    ds.delete("id = 1", useDeletionVectors = true)
    val vDeleted = ds.version
    ds.compact()
    assert(ds.changes(vDeleted, ds.version).count() == 0)
    ds.purgeDeletes()
    assert(ds.changes(vDeleted, ds.version).count() == 0)
    // net feed across delete + compact + purge = just the delete
    val net = byType(ds.changes(vLoaded, ds.version))
    assert(net.keySet == Set("delete"))
    assert(net("delete") == Set((1L, "a")))
  }

  test("changeLog attributes each commit and survives schema evolution") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0)))
    val v1 = ds.version
    ds.append(rows((2, "b", 2.0)))
    ds.renameColumn("name", "title")
    ds.update("id = 1", Map("title" -> "'z'"))
    val log = ds.changeLog(v1, ds.version)
    assert(log.columns.contains("title") && !log.columns.contains("name"))
    val perCommit = log.collect()
      .groupBy(_.getAs[Long]("_commit_version"))
      .view.mapValues(_.map(r => (r.getAs[String]("_change_type"),
        r.getAs[Long]("id"), r.getAs[String]("title"))).toSet).toMap
    assert(perCommit(v1 + 1) == Set(("insert", 2L, "b")))
    // the rename commit itself changes no rows
    assert(!perCommit.contains(v1 + 2))
    assert(perCommit(v1 + 3) ==
      Set(("update_preimage", 1L, "a"), ("update_postimage", 1L, "z")))
  }

  test("restore across a DV delete resurrects rows as inserts") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val vLoaded = ds.version
    ds.delete("id = 2", useDeletionVectors = true)
    val vDeleted = ds.version
    ds.restore(vLoaded)
    val ch = byType(ds.changes(vDeleted, ds.version))
    assert(ch.keySet == Set("insert"))
    assert(ch("insert") == Set((2L, "b")))
  }

  test("change feed through the DSv2 door: reader options and SQL view") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val v1 = ds.version
    ds.delete("id = 1")
    ds.append(rows((3, "c", 3.0)))

    val df = spark.read.format("lake")
      .option("changesFrom", v1.toString).load(root)
    assert(df.columns.contains("_change_type"))
    val got = df.collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("id"))).toSet
    assert(got == Set(("delete", 1L), ("insert", 3L)))

    // pinned range via changesTo + SQL view + column pruning
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW cdf_view USING lake
                 |OPTIONS (path '$root', changesFrom '$v1',
                 |         changesTo '${v1 + 1}')""".stripMargin)
    val sqlGot = spark.sql(
      "SELECT _change_type, id FROM cdf_view ORDER BY id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlGot == Seq(("delete", 1L)))

    // a change-feed handle is read-only
    intercept[Exception] {
      rows((9, "z", 9.0)).write.format("lake").mode("append")
        .option("changesFrom", v1.toString).save(root)
    }
  }

  test("vacuumed range fails fast with the version, not mid-job") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0)))
    ds.append(rows((2, "b", 2.0)))
    ds.append(rows((3, "c", 3.0)))
    ds.vacuum(keepVersions = 2, graceMs = 0L)
    val ex = intercept[IllegalArgumentException] { ds.changes(0, ds.version) }
    assert(ex.getMessage.contains("no version 0"))
    // retained range still works
    assert(ds.changes(ds.version - 1, ds.version).count() == 1)
  }

  test("overwrite nets out as delete+insert; identical rows collapse") {
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    ds.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val v1 = ds.version
    // overwrite with one row kept (same values, NEW rowid → delete+insert
    // is the honest answer: overwrite replaces identity) and one new row
    ds.overwrite(rows((1, "a", 1.0), (9, "x", 9.0)))
    val ch = byType(ds.changes(v1, ds.version))
    assert(ch("delete") == Set((1L, "a"), (2L, "b")))
    assert(ch("insert") == Set((1L, "a"), (9L, "x")))
  }
}
