package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The footer-stats fast path must produce BYTE-IDENTICAL fragment stats
  * to the scan-job path it replaces: same dataset contents written once
  * with `spark.graft.stats.fromFooters=true` (default) and once with the
  * scan fallback forced, manifests compared field by field. Covers the
  * engine's stat-bearing types incl. nulls, negative values, empty
  * strings, decimals, and the exactness edges (a > 4 KB string and a NaN
  * double must FALL BACK, not drop or corrupt stats). */
class FooterStatsSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-footer-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("day", DateType),
    StructField("amt", DecimalType(12, 2)),
    StructField("small", IntegerType)))

  private def frame(r: Row*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach(data.add)
    spark.createDataFrame(data, schema)
  }

  private def sampleRows = Seq(
    Row(1L, "apple", -1.5, true, java.sql.Date.valueOf("2023-01-05"),
      new java.math.BigDecimal("123.45"), 7),
    Row(2L, null, 0.0, false, null, new java.math.BigDecimal("-99.10"), null),
    Row(3L, "", 2.75, null, java.sql.Date.valueOf("2024-06-01"),
      null, -4),
    Row(4L, "zebra" * 40, 1e300, true, java.sql.Date.valueOf("2020-12-31"),
      new java.math.BigDecimal("0.01"), 2000000000))

  private def statsOf(root: String): Map[String, Map[String, ColumnStats]] = {
    val ds = LakeDataset.open(spark, root)
    ds.manifest.fragments.map(f => f.file -> f.stats).toMap
  }

  test("footer stats are byte-identical to the scan-job stats") {
    val rootA = tmpDir()
    val rootB = tmpDir()
    val dsA = LakeDataset.create(spark, s"$rootA/t", schema)
    dsA.append(frame(sampleRows: _*).repartition(2))
    spark.conf.set("spark.graft.stats.fromFooters", "false")
    try {
      val dsB = LakeDataset.create(spark, s"$rootB/t", schema)
      dsB.append(frame(sampleRows: _*).repartition(2))
      val a = statsOf(s"$rootA/t").values.toSeq
        .sortBy(_.toSeq.sortBy(_._1).toString)
      val b = statsOf(s"$rootB/t").values.toSeq
        .sortBy(_.toSeq.sortBy(_._1).toString)
      assert(a == b)
      // same rowid accounting either way
      assert(LakeDataset.open(spark, s"$rootA/t").manifest.nextRowId ==
        LakeDataset.open(spark, s"$rootB/t").manifest.nextRowId)
    } finally spark.conf.set("spark.graft.stats.fromFooters", "true")
  }

  test("exactness edges fall back to the scan, never corrupt stats") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, s"$root/t", schema)
    // > 4 KB string: parquet drops the chunk stats; NaN double: parquet
    // omits min/max. Both must land on scan-computed stats.
    ds.append(frame(
      Row(10L, "x" * 5000, Double.NaN, true,
        java.sql.Date.valueOf("2023-01-05"),
        new java.math.BigDecimal("5.00"), 1),
      Row(11L, "abc", 3.5, false, null,
        new java.math.BigDecimal("6.00"), 2)).coalesce(1))
    val st = statsOf(s"$root/t").values.head
    val byField = LakeDataset.open(spark, s"$root/t").manifest.fields
      .map(f => f.name -> st(f.id.toString)).toMap
    assert(byField("name").min.contains("abc"))
    assert(byField("name").max.exists(_.startsWith("xxx")))
    // Spark max treats NaN as greater than any double
    assert(byField("score").min.contains("3.5"))
    assert(byField("score").max.contains("NaN"))
    assert(byField("id").min.contains("10") && byField("id").max.contains("11"))
  }

  test("delete/update/merge keep exact stats through rewrites") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, s"$root/t", schema)
    ds.append(frame(sampleRows: _*).coalesce(1))
    ds.delete("id = 2")
    ds.update("id = 1", Map("score" -> "score + 10"))
    val merged = frame(
      Row(3L, "updated", 9.9, true, java.sql.Date.valueOf("2025-01-01"),
        new java.math.BigDecimal("1.00"), 5),
      Row(99L, "new", 0.5, false, null,
        new java.math.BigDecimal("2.00"), 6))
    ds.mergeInsert(merged, Seq("id"))
    val got = ds.read().orderBy("id")
      .select("id", "name", "score").collect().toSeq
    assert(got.map(_.getLong(0)) == Seq(1L, 3L, 4L, 99L))
    // stats agree with a fresh scan-path recompute of the same live rows
    val mn = ds.read().agg(min("id"), max("id"), min("score"), max("score"))
      .collect()(0)
    val idStats = ds.manifest.fragments.flatMap(_.stats.get(
      ds.manifest.fields.find(_.name == "id").get.id.toString))
    assert(idStats.flatMap(_.min).map(_.toLong).min == mn.getLong(0))
    assert(idStats.flatMap(_.max).map(_.toLong).max == mn.getLong(1))
  }
}
