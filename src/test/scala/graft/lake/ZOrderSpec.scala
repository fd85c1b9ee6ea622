package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order layout: multi-dimensional clustering so zonemaps prune on EVERY
  * z column, where the lexicographic layout only serves its lead column. */
class ZOrderSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-zorder-").toString

  private val schema = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("tag", StringType)))

  /** 64x64 grid: x and y are independent, the worst case for a
    * single-column sort. */
  private def grid() = {
    import spark.implicits._
    (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, s"t${(x * 64 + y) % 7}")))
      .toDF("x", "y", "tag")
  }

  test("z-order prunes on both dimensions; lexicographic only on the lead") {
    val lexDir = tmpDir(); val zDir = tmpDir()
    val lex = LakeDataset.create(spark, lexDir, schema)
    lex.append(grid().repartition(4))
    lex.optimizeLayoutWith(Seq("x", "y"), targetRows = 256) // 16 fragments
    val zed = LakeDataset.create(spark, zDir, schema)
    zed.append(grid().repartition(4))
    zed.optimizeLayoutZOrder(Seq("x", "y"), targetRows = 256)

    val nLex = lex.manifest.fragments.size
    val nZ = zed.manifest.fragments.size
    assert(nLex >= 8 && nZ >= 8, s"expected ~16 fragments, got $nLex / $nZ")

    // lead-column range: both layouts prune hard
    assert(lex.prunedFileCount("x < 8") <= nLex / 2)
    assert(zed.prunedFileCount("x < 8") <= nZ / 2)
    // secondary-column range: lexicographic reads everything (y spans the
    // full domain in every fragment); z-order reads a fraction
    assert(lex.prunedFileCount("y < 8") == nLex,
      "lexicographic layout should NOT prune on the secondary column")
    assert(zed.prunedFileCount("y < 8") <= nZ / 2,
      s"z-order should prune on y: scanned ${zed.prunedFileCount("y < 8")} of $nZ")
    // point lookups on either dimension stay sub-linear under z-order
    assert(zed.prunedFileCount("x = 11 AND y = 52") <= nZ / 4)
  }

  test("z-order rewrite preserves content, rowids, and survives reopen") {
    val dir = tmpDir()
    val ds = LakeDataset.create(spark, dir, schema)
    ds.append(grid().repartition(3))
    val before = ds.read().orderBy("x", "y").collect()
    val beforeIds = ds.scanner().withRowId.build()
      .select("_rowid", "x", "y").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    ds.optimizeLayoutZOrder(Seq("x", "y"), targetRows = 1024)
    val after = LakeDataset.open(spark, dir).read()
      .orderBy("x", "y").collect()
    assert(before.map(_.toSeq).toSeq == after.map(_.toSeq).toSeq)
    val afterIds = LakeDataset.open(spark, dir).scanner().withRowId.build()
      .select("_rowid", "x", "y").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    assert(beforeIds == afterIds, "stable rowids must survive the rewrite")
  }

  test("null values in a z column rank as bucket 0 and survive the rewrite") {
    val dir = tmpDir()
    val nSchema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = true),
      StructField("tag", StringType)))
    val ds = LakeDataset.create(spark, dir, nSchema)
    val rows = new java.util.ArrayList[Row]()
    (0 until 500).foreach { i =>
      rows.add(Row(i.toLong, if (i % 7 == 0) null else (i % 50).toLong, s"t$i"))
    }
    ds.append(spark.createDataFrame(rows, nSchema).repartition(3))
    ds.optimizeLayoutZOrder(Seq("x", "y"), targetRows = 128)
    val out = ds.read()
    assert(out.count() == 500)
    assert(out.filter(col("y").isNull).count() == 72) // ceil(500/7)
    // pruning on the nullable column still works for non-null predicates
    assert(ds.prunedFileCount("y >= 40") < ds.manifest.fragments.size)
  }

  test("DATE z columns rank by epoch day; invalid target_rows is rejected") {
    val dir = tmpDir()
    val dSchema = StructType(Seq(
      StructField("d", DateType, nullable = false),
      StructField("x", LongType, nullable = false)))
    val ds = LakeDataset.create(spark, dir, dSchema)
    val rows = new java.util.ArrayList[Row]()
    (0 until 400).foreach { i =>
      rows.add(Row(java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i % 100)), i.toLong))
    }
    ds.append(spark.createDataFrame(rows, dSchema).repartition(3))
    ds.optimizeLayoutZOrder(Seq("d", "x"), targetRows = 128)
    assert(ds.read().count() == 400)
    // the date dimension actually clusters: a narrow date range prunes
    assert(ds.prunedFileCount("d < DATE'2024-01-10'") <
      ds.manifest.fragments.size)
    val err = intercept[IllegalArgumentException] {
      ds.optimizeLayoutZOrder(Seq("d", "x"), targetRows = 0)
    }
    assert(err.getMessage.contains("targetRows"))
  }

  test("string z columns rank by hash bucket and equality still prunes via stats") {
    val dir = tmpDir()
    val ds = LakeDataset.create(spark, dir, schema)
    ds.append(grid().repartition(4))
    ds.optimizeLayoutZOrder(Seq("x", "tag"), targetRows = 512)
    val n = ds.manifest.fragments.size
    assert(n >= 4)
    // hash-bucketed tag clusters equal values together; the value-set /
    // min-max stats then exclude fragments without the value
    val scanned = ds.prunedFileCount("tag = 't3'")
    assert(scanned < n, s"tag equality should prune: $scanned of $n")
    assert(ds.read().count() == 64L * 64)
  }
}
