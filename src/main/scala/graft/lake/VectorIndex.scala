package graft.lake

import java.nio.file.{Files, Paths}

import graft.functions.GraftFunctions
import graft.pipeline.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF vector index over a [[LakeDataset]] — the counterpart of
  * the reference's KNNIndexManager Create/Build/Save/Load/Search
  * (pkg/storage2/knn.go:14-450) with the IVF layout of ivf_index.go.
  *
  * Layout: `<root>/_indexes/<name>/v<version>/{centroids,assignments}` —
  * an index is built against a dataset VERSION; `search` uses it when it
  * matches the current version's vectors and silently stays correct under
  * later deletes because assignments are keyed by stable `_rowid` and
  * joined back to the live data (rows deleted since build simply drop out
  * of the join; the reference's deletion-bitmap prefilter achieves the
  * same). Rewrites that change vector VALUES require a rebuild.
  *
  * Scale: centroids are tiny (broadcast); assignments are parquet with the
  * cluster id as a leading column, so probing reads only the probed
  * clusters' row groups (predicate pushdown on `cluster`).
  */
object VectorIndex {

  val DefaultClusters: Int = Ann.NumClusters

  private def indexDir(ds: LakeDataset, name: String, version: Long) =
    Paths.get(ds.root, "_indexes", name, f"v$version%020d")

  /** Build (train + assign + persist) at the dataset's current version. */
  def build(ds: LakeDataset, vecCol: String, name: String = "ivf"): Unit = {
    val spark = ds.spark
    GraftFunctions.register(spark)
    val data = ds.scanner().withRowId.build()
      .select(col(LakeDataset.RowIdCol).as("_rowid"), col(vecCol).as("vec"))
      .filter(col("vec").isNotNull)
    val e = data.select(col("_rowid").as("vec_id"), col("vec").as("embedding"))
    val (assign, centroids) = Ann.trainIvf(e)
    val dir = indexDir(ds, name, ds.version)
    Files.createDirectories(dir)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    assign.select(col("cluster"), col("vec_id").as("_rowid"))
      .repartition(1).sortWithinPartitions("cluster")
      .write.mode("overwrite").parquet(s"$dir/assignments")
  }

  /** Newest built version ≤ the dataset's current version, if any. */
  def builtVersion(ds: LakeDataset, name: String): Option[Long] = {
    val base = Paths.get(ds.root, "_indexes", name)
    if (!Files.exists(base)) return None
    import scala.jdk.CollectionConverters._
    Files.list(base).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("v"))
      .map(_.drop(1).toLong)
      .filter(_ <= ds.version)
      .maxOption
  }

  /** IVF top-k cosine search with an optional SQL prefilter over the
    * dataset's columns (reference prefilter.go composition). Falls back to
    * brute force when no index exists. */
  def search(ds: LakeDataset, vecCol: String, query: Seq[Float], k: Int,
      nprobe: Int = 4, name: String = "ivf",
      prefilter: Option[String] = None): DataFrame = {
    val spark = ds.spark
    GraftFunctions.register(spark)
    val qvec = typedlit(query)
    val live0 = ds.scanner().withRowId.build()
    val live = prefilter.fold(live0)(p => live0.filter(expr(p)))

    val candidates = builtVersion(ds, name) match {
      case Some(v) =>
        val dir = indexDir(ds, name, v)
        val centroids = spark.read.parquet(s"$dir/centroids")
        val probed = centroids
          .withColumn("d", call_function("l2_distance", qvec, col("centroid")))
          .orderBy(col("d"), col("cluster")).limit(nprobe)
          .select("cluster")
        // pushdown: only the probed clusters' row groups are read
        val assignments = spark.read.parquet(s"$dir/assignments")
          .join(broadcast(probed), Seq("cluster"))
          .select(col("_rowid").as("_idx_rowid"))
        live.join(assignments,
          col(LakeDataset.RowIdCol) === col("_idx_rowid"))
          .drop("_idx_rowid")
      case None => live
    }
    candidates
      .withColumn("_sim", call_function("cosine_sim", col(vecCol), qvec))
      .orderBy(col("_sim").desc, col(LakeDataset.RowIdCol))
      .limit(k)
      .select((ds.schema.fieldNames.map(col) :+
        round(col("_sim"), 4).as("similarity")): _*)
  }
}
