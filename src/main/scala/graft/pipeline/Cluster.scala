package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.GraftFunctions

/** K-means document/embedding clustering — the corpus-organization
  * operator an LLM data pipeline runs between dedup and mixing (topic
  * buckets, domain balancing, cluster-based decontamination). Built the
  * Spark-native way: centroids are tiny and broadcast; every pass over the
  * corpus is a narrow map (codegen'd [[graft.functions.VectorExpressions]]
  * kernels) plus one partial-aggregated groupBy — no corpus shuffle wider
  * than (k × dim) rows, so the plan is identical at 2k vectors and at
  * 100 TB (the per-iteration reduce state is k·dim doubles regardless of
  * corpus size; iterations are driver-looped over broadcast state like the
  * IVF trainer in [[graft.lake.VectorIndex]]).
  *
  * Oracle strategy: Lloyd's algorithm is iterative, but each piece is
  * portable SQL — `cluster_assign` (nearest-centroid over seed centroids)
  * and `cluster_kmeans_step` (one full Lloyd update: assign + per-dimension
  * means) hash-check against DuckDB's `list_cosine_similarity` /
  * `generate_subscripts`; the multi-iteration `cluster_kmeans` summary is
  * pinned by ClusterSpec (step-1 ≡ cluster_kmeans_step replay, inertia
  * monotone, deterministic seeds → deterministic output). */
object Cluster {

  /** Cluster count; seeds are the k lowest vec_ids (deterministic, and both
    * engines can name them without an RNG). */
  val K = 8
  val Iters = 5

  private def emb(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings")
  }

  /** Seed centroids: the K lowest vec_ids, as (cluster, cvec). */
  private def seeds(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("cluster"),
        col("embedding").as("cvec"))

  /** Nearest-centroid assignment of every vector against a (cluster, cvec)
    * centroid frame: broadcast cross join + per-vector argmax. Ties break
    * to the lowest cluster id (mirrored in the oracle's ORDER BY). */
  def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = e.crossJoin(broadcast(centroids))
      .withColumn("sim",
        call_function("cosine_sim", col("embedding"), col("cvec")))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cluster"))))
      .filter(col("rn") === 1)
      .drop("rn", "cvec")
  }

  private val assignOracle =
    s"""WITH c AS (SELECT CAST(vec_id AS INT) AS cluster, embedding AS cvec
       |           FROM embeddings WHERE vec_id < $K),
       |scored AS (SELECT e.vec_id, c.cluster,
       |             list_cosine_similarity(e.embedding, c.cvec) AS sim
       |           FROM embeddings e, c),
       |ranked AS (SELECT vec_id, cluster,
       |             row_number() OVER (PARTITION BY vec_id
       |                                ORDER BY sim DESC, cluster) AS rn
       |           FROM scored)
       |SELECT vec_id, cluster FROM ranked WHERE rn = 1""".stripMargin

  /** Oracle-checked: nearest-centroid assignment over the seed centroids.
    * Output is (vec_id, cluster) only: the raw similarity differs between
    * engines in the last float ulp, so a rounded copy of it can land on
    * either side of a rounding boundary (observed: 0.1439 vs 0.144) — the
    * argmax is stable, the decoration is not. */
  val assignQ: Q = Q("cluster_assign", assignOracle) { (s, dir) =>
    val e = emb(s, dir)
    assign(e.select("vec_id", "embedding"), seeds(e))
      .select(col("vec_id"), col("cluster"))
  }

  /** Oracle-checked: ONE full Lloyd update — assign to seeds, then the new
    * per-cluster per-dimension means (fixed-point), plus cluster sizes.
    * `pos` is 1-based to match DuckDB's generate_subscripts. */
  val stepQ: Q = Q("cluster_kmeans_step",
    s"""WITH c AS (SELECT CAST(vec_id AS INT) AS cluster, embedding AS cvec
       |           FROM embeddings WHERE vec_id < $K),
       |scored AS (SELECT e.vec_id, c.cluster,
       |             list_cosine_similarity(e.embedding, c.cvec) AS sim
       |           FROM embeddings e, c),
       |assigned AS (SELECT vec_id, cluster FROM (
       |    SELECT vec_id, cluster,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY sim DESC, cluster) AS rn
       |    FROM scored) t WHERE rn = 1),
       |exploded AS (
       |  SELECT a.cluster,
       |         generate_subscripts(e.embedding, 1) AS pos,
       |         unnest(e.embedding) AS val
       |  FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id)
       |SELECT cluster, pos,
       |       CAST(round(avg(CAST(val AS DOUBLE)) * 10000) AS BIGINT) AS mean_c,
       |       count(*) AS members
       |FROM exploded GROUP BY cluster, pos""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    val assigned = assign(e.select("vec_id", "embedding"), seeds(e))
      .select("vec_id", "cluster")
    assigned.join(e.select("vec_id", "embedding"), "vec_id")
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("p0", "val")))
      .groupBy(col("cluster"), (col("p0") + 1).as("pos"))
      .agg(
        (round(avg(col("val").cast("double")) * 10000)).cast("long").as("mean_c"),
        count(lit(1)).as("members"))
  }

  /** Full Lloyd run: `iters` iterations from the deterministic seeds.
    * Returns the final assignment frame (vec_id, cluster, sim). Centroid
    * state lives on the driver as k·dim floats (bounded, corpus-size-
    * independent) and re-enters the plan via a broadcast local relation. */
  def kmeans(s: SparkSession, e: DataFrame, k: Int = K,
      iters: Int = Iters, trackInertia: Boolean = true): (DataFrame, Seq[Double]) = {
    import graft.Materialize.PinOps
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val centSchema = StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("cvec", ArrayType(FloatType, containsNull = false))))
    def centDf(cs: Seq[(Int, Array[Float])]): DataFrame =
      s.createDataFrame(
        java.util.Arrays.asList(
          cs.map { case (c, v) => Row(c, v.toSeq) }: _*), centSchema)

    var centroids: Seq[(Int, Array[Float])] =
      e.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int"), col("embedding"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).toSeq

    val inertias = mutable.ArrayBuffer.empty[Double]
    var lastAssign: DataFrame = null
    (0 until iters).foreach { _ =>
      // pin the assignment: inertia + means both read it, and without the
      // pin each re-executes the crossJoin+window pass
      val a = assign(e.select("vec_id", "embedding"), centDf(centroids))
        .pinned()
      // the pin is eager and derives only from e + driver-side centroids,
      // so iteration t−1's blocks are dead once t's pin exists — without
      // this unpersist the loop held iters × corpus in the block manager
      // (r8 verdict #4: a spill/eviction storm at real scale)
      if (lastAssign != null) graft.Materialize.unpin(lastAssign)
      lastAssign = a
      // Inertia under the cosine metric: Σ (1 - sim). One scalar per pass.
      if (trackInertia)
        inertias += a.agg(sum(lit(1.0) - col("sim"))).head().getDouble(0)
      // New means: (k × dim) aggregate rows — tiny regardless of corpus.
      // The pinned assignment already carries `embedding` (assign keeps the
      // input columns), so no join back to the corpus — the old
      // join-on-vec_id shuffled the embeddings once per iteration for rows
      // the frame already held.
      val means = a
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.map { case (c, old) =>
        byCluster.get(c) match {
          case Some(rows) if rows.nonEmpty =>
            val v = new Array[Float](dim)
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
            (c, v)
          case _ => (c, old) // empty cluster keeps its centroid
        }
      }
    }
    (lastAssign, inertias.toSeq)
  }

  // ------------------------------------------- oracle-checked full Lloyd
  // A fixed 3-iteration Lloyd run made EXACTLY replayable across engines
  // (r5 verdict ask): quantize embeddings to integers (round(v·1000)),
  // keep centroids integer through every mean update (round(sum/count)),
  // and compute cosine as CAST(dot AS DOUBLE)/(sqrt(n_v)·sqrt(n_c)) —
  // every intermediate is either an exact integer (<2^53, any summation
  // order) or a single correctly-rounded IEEE op, so Spark and DuckDB
  // produce bit-identical similarities, identical argmax assignments, and
  // identical centroids at every iteration. Negative-half rounding agrees
  // too (both round half away from zero — verified on both engines).
  val FixedIters = 3

  /** One exactly-replayable Lloyd run over quantized embeddings; returns
    * the final (vec_id, cluster) assignment. Centroid state is k·dim
    * integers on the driver per iteration — bounded, corpus-independent,
    * same shape as [[kmeans]]. */
  def kmeansFixed(s: SparkSession, e: DataFrame, k: Int = K,
      iters: Int = FixedIters): DataFrame = {
    import graft.Materialize.PinOps
    val eq = e.select(col("vec_id"),
        transform(col("embedding"),
          v => round(v.cast("double") * 1000).cast("long")).as("qv"))
      .withColumn("n",
        aggregate(col("qv"), lit(0L), (a, x) => a + x * x))
      .pinned() // read k+1 times (seeds + per-iteration passes)
    var cent: Seq[(Int, Array[Long])] = eq.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int"), col("qv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val centSchema = StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("cqv", ArrayType(LongType, containsNull = false)),
      StructField("cn", LongType, nullable = false)))
    def centDf(cs: Seq[(Int, Array[Long])]): DataFrame =
      s.createDataFrame(java.util.Arrays.asList(cs.map { case (c, v) =>
        Row(c, v.toSeq, v.map(x => x * x).sum)
      }: _*), centSchema)
    def assignFixed(cs: Seq[(Int, Array[Long])]): DataFrame =
      eq.crossJoin(broadcast(centDf(cs)))
        .withColumn("dot", aggregate(
          zip_with(col("qv"), col("cqv"), (x, y) => x * y),
          lit(0L), (a, x) => a + x))
        .withColumn("sim", col("dot").cast("double") /
          (sqrt(col("n").cast("double")) * sqrt(col("cn").cast("double"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cluster"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cluster"))
    var assigned: DataFrame = null
    (1 to iters).foreach { t =>
      // pin each iteration's assignment — (vec_id, cluster) rows: the means
      // pass reads it, and the FINAL one is consumed twice by the caller's
      // purity summary (each read otherwise re-runs crossJoin + window)
      val next = assignFixed(cent).pinned()
      // eager pin derives from eq + driver-side cent only — release the
      // previous iteration's blocks (same leak fix as [[kmeans]])
      if (assigned != null) graft.Materialize.unpin(assigned)
      assigned = next
      if (t < iters) {
        val means = assigned.join(eq.select(col("vec_id"), col("qv")), "vec_id")
          .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "q")))
          .groupBy("cluster", "pos")
          .agg(round(sum("q").cast("double") / count(lit(1)).cast("double"))
            .cast("long").as("q"))
          .collect()
          .groupBy(_.getInt(0))
        cent = cent.map { case (c, old) =>
          means.get(c) match {
            case Some(rows) if rows.nonEmpty =>
              val v = old.clone()
              rows.foreach(r => v(r.getInt(1)) = r.getLong(2))
              (c, v)
            case _ => (c, old) // empty cluster keeps its centroid
          }
        }
      }
    }
    // eq fed only the per-iteration assign/means passes; the returned
    // frame is its own pin, so the corpus-sized qv blocks are dead here
    graft.Materialize.unpin(eq)
    assigned
  }

  /** DuckDB replay of the same run: the iteration loop unrolled into CTEs
    * (cq0 → a1 → cq1 → a2 → … ), every expression mirroring the Spark
    * arithmetic op-for-op. */
  private def kmeansFixedOracle(k: Int, iters: Int): String = {
    val b = new StringBuilder
    b ++= s"""WITH eq AS (
             |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
             |  FROM embeddings),
             |nrm AS (SELECT vec_id, sum(q*q) AS n FROM eq GROUP BY vec_id),
             |cq0 AS (SELECT CAST(vec_id AS INT) AS cluster, pos, q
             |        FROM eq WHERE vec_id < $k)""".stripMargin
    (1 to iters).foreach { t =>
      val prev = s"cq${t - 1}"
      b ++= s""",
               |a$t AS (
               |  SELECT vec_id, cluster FROM (
               |    SELECT s.vec_id, s.cluster,
               |      row_number() OVER (PARTITION BY s.vec_id
               |                         ORDER BY s.sim DESC, s.cluster) AS rn
               |    FROM (
               |      SELECT e.vec_id, c.cluster,
               |        CAST(sum(e.q * c.q) AS DOUBLE) /
               |          (sqrt(CAST(n1.n AS DOUBLE)) * sqrt(CAST(cn.n AS DOUBLE))) AS sim
               |      FROM eq e
               |      JOIN $prev c ON e.pos = c.pos
               |      JOIN nrm n1 ON n1.vec_id = e.vec_id
               |      JOIN (SELECT cluster, sum(q*q) AS n FROM $prev GROUP BY cluster) cn
               |        ON cn.cluster = c.cluster
               |      GROUP BY e.vec_id, c.cluster, n1.n, cn.n) s) r
               |  WHERE rn = 1)""".stripMargin
      if (t < iters)
        b ++= s""",
                 |cq$t AS (
                 |  SELECT o.cluster, o.pos, COALESCE(m.q, o.q) AS q
                 |  FROM $prev o LEFT JOIN (
                 |    SELECT a.cluster, e.pos,
                 |      CAST(round(CAST(sum(e.q) AS DOUBLE) /
                 |                 CAST(count(*) AS DOUBLE)) AS BIGINT) AS q
                 |    FROM a$t a JOIN eq e ON a.vec_id = e.vec_id
                 |    GROUP BY a.cluster, e.pos) m
                 |  ON m.cluster = o.cluster AND m.pos = o.pos)""".stripMargin
    }
    b ++= s"""
             |SELECT s.cluster, s.size, d.dominant_label,
             |  CAST(round(CAST(d.n AS DOUBLE) * 10000 / CAST(s.size AS DOUBLE)) AS BIGINT)
             |    AS purity_c
             |FROM (SELECT cluster, count(*) AS size FROM a$iters GROUP BY cluster) s
             |JOIN (
             |  SELECT cluster, label AS dominant_label, n FROM (
             |    SELECT c.*, row_number() OVER (PARTITION BY cluster
             |                                   ORDER BY n DESC, label) AS rn
             |    FROM (SELECT a.cluster, e.label, count(*) AS n
             |          FROM a$iters a JOIN embeddings e ON a.vec_id = e.vec_id
             |          GROUP BY a.cluster, e.label) c) t WHERE rn = 1) d
             |ON s.cluster = d.cluster""".stripMargin
    b.toString
  }

  /** Oracle-checked end-to-end k-means: per-cluster summary (size,
    * dominant generator label, purity) after the fixed 3-iteration
    * quantized Lloyd run — DuckDB replays all three iterations exactly.
    * The float-kernel [[kmeans]] stays the production path (same plan
    * shape, codegen'd cosine); ClusterSpec pins the two agree on sf0.001
    * cluster structure. */
  val kmeansQ: Q = Q("cluster_kmeans",
    kmeansFixedOracle(K, FixedIters)) { (s, dir) =>
    val e = emb(s, dir)
    val assigned = kmeansFixed(s, e.select("vec_id", "embedding"))
    val withLabel = assigned.join(e.select("vec_id", "label"), "vec_id")
    val dominant = withLabel.groupBy("cluster", "label")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster").orderBy(col("n").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("label").as("dominant_label"),
        col("n").as("dominant_n"))
    withLabel.groupBy("cluster").agg(count(lit(1)).as("size"))
      .join(dominant, "cluster")
      .withColumn("purity_c",
        round(col("dominant_n").cast("double") * 10000 /
          col("size").cast("double")).cast("long"))
      .select("cluster", "size", "dominant_label", "purity_c")
  }

  val all: Seq[Q] = Seq(assignQ, stepQ, kmeansQ)
}
