package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SpatialIndex: fragment-bbox pruning + branch-and-bound kNN — the
  * R-tree-equivalent surface (reference rtree_index.go RangeSearch /
  * ContainsSearch / NearestNeighbors). */
class SpatialIndexSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-spatial-").toString

  private val ptSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** 48x48 grid of points, z-ordered into ~16 spatially tight fragments. */
  private def pointLake(): LakeDataset = {
    import spark.implicits._
    val pts = (0 until 48).flatMap(x => (0 until 48).map(y =>
      ((x * 48 + y).toLong, x.toDouble, y.toDouble)))
      .toDF("id", "x", "y")
    val ds = LakeDataset.create(spark, tmpDir(), ptSchema)
    ds.append(pts.repartition(4))
    ds.optimizeLayoutZOrder(Seq("x", "y"), targetRows = 144)
    ds
  }

  test("knn matches brute force and reads only candidate fragments") {
    val ds = pointLake()
    val n = ds.manifest.fragments.size
    assert(n > 4, s"need a multi-fragment layout, got $n")
    for ((px, py) <- Seq((10.3, 40.1), (0.0, 0.0), (47.9, 23.5))) {
      val got = SpatialIndex.knn(ds, "x", "y", px, py, k = 9, tieCol = "id")
        .select("id").collect().map(_.getLong(0)).toSeq
      val brute = ds.read()
        .withColumn("d",
          (col("x") - px) * (col("x") - px) +
          (col("y") - py) * (col("y") - py))
        .orderBy(col("d"), col("id")).limit(9)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got == brute, s"knn@($px,$py)")
      // 9 nearest grid neighbors sit within distance ~3 of the query —
      // a tight z-ordered layout must not need every fragment for that
      assert(SpatialIndex.knnCandidateFiles(ds, "x", "y", px, py, 4.0) < n,
        s"no bbox pruning at ($px,$py)")
    }
  }

  test("knn stays exact after deletes thin the nearest fragment") {
    val ds = pointLake()
    // delete the immediate neighborhood of the query point: phase 1's
    // nearest fragment loses rows, the bound widens, phase 2 must pull
    // from fragments farther out
    ds.delete("x >= 20 AND x <= 24 AND y >= 20 AND y <= 24")
    val got = SpatialIndex.knn(ds, "x", "y", 22.0, 22.0, k = 12,
        tieCol = "id")
      .select("id").collect().map(_.getLong(0)).toSeq
    val brute = ds.read()
      .withColumn("d",
        (col("x") - 22.0) * (col("x") - 22.0) +
        (col("y") - 22.0) * (col("y") - 22.0))
      .orderBy(col("d"), col("id")).limit(12)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == brute)
    assert(got.nonEmpty && !got.exists { id =>
      val (x, y) = ((id / 48).toDouble, (id % 48).toDouble)
      x >= 20 && x <= 24 && y >= 20 && y <= 24
    }, "deleted points leaked into knn")
  }

  test("knn with k beyond live rows returns everything, ordered") {
    import spark.implicits._
    val ds = LakeDataset.create(spark, tmpDir(), ptSchema)
    ds.append(Seq((1L, 0.0, 0.0), (2L, 3.0, 4.0), (3L, 6.0, 8.0))
      .toDF("id", "x", "y"))
    val got = SpatialIndex.knn(ds, "x", "y", 0.0, 0.0, k = 10, tieCol = "id")
      .select(col("id"), col("_dist")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getDouble(1)).toSeq == Seq(0.0, 5.0, 10.0))
  }

  private val boxSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("x_min", DoubleType, nullable = false),
    StructField("y_min", DoubleType, nullable = false),
    StructField("x_max", DoubleType, nullable = false),
    StructField("y_max", DoubleType, nullable = false)))

  private val boxCols = SpatialIndex.BoxCols("x_min", "y_min", "x_max", "y_max")

  test("intersects/contains match predicate semantics and prune fragments") {
    import spark.implicits._
    // 3x3 boxes anchored on a 40x40 grid
    val boxes = (0 until 40).flatMap(x => (0 until 40).map(y =>
      ((x * 40 + y).toLong, x.toDouble, y.toDouble, x + 3.0, y + 3.0)))
      .toDF("id", "x_min", "y_min", "x_max", "y_max")
    val ds = LakeDataset.create(spark, tmpDir(), boxSchema)
    ds.append(boxes.repartition(4))
    ds.optimizeLayoutZOrder(Seq("x_min", "y_min"), targetRows = 100)
    val q = SpatialIndex.BBox(10.0, 10.0, 16.0, 16.0)

    val inter = SpatialIndex.intersects(ds, boxCols, q)
      .select("id").collect().map(_.getLong(0)).toSet
    val cont = SpatialIndex.contains(ds, boxCols, q)
      .select("id").collect().map(_.getLong(0)).toSet
    // ground truth from the generator: [x, x+3] overlaps [10,16] iff
    // x in [7,16]; contained iff x in [10,13]
    val expInter = (for {
      x <- 7 to 16; y <- 7 to 16
    } yield (x * 40 + y).toLong).toSet
    val expCont = (for {
      x <- 10 to 13; y <- 10 to 13
    } yield (x * 40 + y).toLong).toSet
    assert(inter == expInter)
    assert(cont == expCont)
    assert(cont.subsetOf(inter))

    val total = ds.manifest.fragments.size
    val scanned = ds.prunedFileCount(
      s"x_min <= ${q.xMax} AND x_max >= ${q.xMin} AND " +
      s"y_min <= ${q.yMax} AND y_max >= ${q.yMin}")
    assert(scanned < total,
      s"bbox query scanned all $total fragments after z-order")
  }

  test("rangePoints equals a plain conjunctive filter") {
    val ds = pointLake()
    val q = SpatialIndex.BBox(5.5, 7.0, 11.0, 9.5)
    val got = SpatialIndex.rangePoints(ds, "x", "y", q)
      .select("id").collect().map(_.getLong(0)).toSet
    val exp = ds.read()
      .filter(col("x") >= q.xMin && col("x") <= q.xMax &&
        col("y") >= q.yMin && col("y") <= q.yMax)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == exp && got.nonEmpty)
  }
}
