package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-order-INDEPENDENT decision-tree trainer: the determinism the
  * quality-model entry needs that `ml.DecisionTreeClassifier` cannot give
  * (its split scoring treeAggregates float impurity sums, so thresholds
  * depend on accumulation order — the reason `text_quality_model` sat on
  * the no-oracle list through round 7).
  *
  * Design: candidate thresholds come from FIXED arithmetic grids (not
  * data-derived quantiles, which are themselves order-dependent), split
  * statistics are exact BIGINT label counts per (node, feature, grid bin)
  * — one `groupBy().count()` per tree level, commutative and associative
  * in the integers — and gini scoring runs on the driver over those exact
  * counts. Same data in any partitioning → bit-identical tree. That makes
  * the learned model a pure function of the dataset, which is what lets
  * the registry freeze the sf0.01 tree into a static DuckDB oracle
  * (QualityModelSpec pins frozen == freshly-trained).
  *
  * 100 TB shape: train-on-sample, score-everywhere. Each level is one
  * narrow pass + one shuffle of at most nodes × Σ|grid| × 2 histogram
  * rows (thousands — independent of row count); the model is a few dozen
  * nodes rendered to a portable SQL CASE, codegen'd by Catalyst at
  * scoring time, zero driver involvement per row. */
object DeterministicTree {

  /** Arithmetic candidate grid: thresholds `t_i = start + i*step`,
    * `i ∈ [0, n)`. Dyadic steps keep the rendered literals short and the
    * Spark/DuckDB comparisons bit-identical. */
  final case class Grid(start: Double, step: Double, n: Int) {
    def threshold(i: Int): Double = start + i * step
    /** `bin(v)` = smallest i with `v <= t_i` (n when v is past the last
      * threshold), so `v <= t_i  ⇔  bin(v) <= i`. */
    def binCol(v: Column): Column =
      least(lit(n), greatest(lit(0),
        ceil((v - lit(start)) / lit(step)).cast("int")))
  }

  sealed trait Node {
    /** Portable (Spark + DuckDB) expression for the 0/1 prediction. */
    def predSql: String
    /** Portable expression for P(label=1) — leaf purity. */
    def probSql: String
    def leaves: Int
  }
  final case class Leaf(n0: Long, n1: Long) extends Node {
    def pred: Int = if (n1 >= n0) 1 else 0 // p1 >= 0.5 keeps
    def p1: Double = n1.toDouble / math.max(1L, n0 + n1)
    def predSql: String = pred.toString
    // bare decimal literals parse as DECIMAL in Spark; pin the type
    def probSql: String = s"CAST($p1 AS DOUBLE)"
    def leaves: Int = 1
  }
  final case class Inner(feature: String, threshold: Double,
      left: Node, right: Node) extends Node {
    private def caseOf(l: String, r: String) =
      s"(CASE WHEN $feature <= $threshold THEN $l ELSE $r END)"
    def predSql: String = caseOf(left.predSql, right.predSql)
    def probSql: String = caseOf(left.probSql, right.probSql)
    def leaves: Int = left.leaves + right.leaves
  }

  private def gini(n0: Long, n1: Long): Double = {
    val n = (n0 + n1).toDouble
    if (n == 0) 0.0
    else {
      val p0 = n0 / n; val p1 = n1 / n
      1.0 - p0 * p0 - p1 * p1
    }
  }

  /** Fit on `df`'s numeric feature columns and an integer 0/1 `labelCol`.
    * Level-synchronous: one histogram aggregation per depth. */
  def train(df: DataFrame, features: Seq[(String, Grid)], labelCol: String,
      maxDepth: Int = 6, minCount: Long = 20L,
      minGain: Double = 1e-9): Node = {
    val gridOf = features.toMap
    // bin every feature once; bins are small ints from here on
    val binned = df.select(
      col(labelCol).cast("int").as("_l") +:
        features.map { case (f, g) => g.binCol(col(f)).as(s"_b_$f") }: _*)
      .cache() // maxDepth passes over the same tiny binned projection

    // working tree over BIN indices (thresholds resolve at the end):
    // nodes addressed by root-to-leaf path ("", "L", "LR", ...)
    sealed trait W
    case class WOpen(depth: Int) extends W
    case class WLeaf(n0: Long, n1: Long) extends W
    case class WInner(feature: String, binIdx: Int, l: String, r: String)
      extends W
    val nodes = scala.collection.mutable.Map[String, W]("" -> WOpen(0))

    def nodeIdCol(path: String): Column = nodes(path) match {
      case WInner(f, i, l, r) =>
        when(col(s"_b_$f") <= i, nodeIdCol(l)).otherwise(nodeIdCol(r))
      case _ => lit(path)
    }

    while (nodes.values.exists(_.isInstanceOf[WOpen])) {
      val open = nodes.collect { case (p, WOpen(d)) => p -> d }.toMap
      // one pass: per (open node, feature, bin, label) exact counts
      val hist = binned
        .withColumn("_node", nodeIdCol(""))
        .filter(col("_node").isin(open.keys.toSeq: _*))
        .select(col("_node"), col("_l"), explode(array(features.map {
          case (f, _) => struct(lit(f).as("f"), col(s"_b_$f").as("b"))
        }: _*)).as("fb"))
        .groupBy(col("_node"), col("fb.f").as("f"), col("fb.b").as("b"),
          col("_l"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))

      open.foreach { case (path, depth) =>
        val rows =
          hist.getOrElse(path, Array.empty[org.apache.spark.sql.Row])
        val n1 = rows.filter(_.getInt(3) == 1).map(_.getLong(4)).sum
        val n0 = rows.filter(_.getInt(3) == 0).map(_.getLong(4)).sum
        val n = n0 + n1
        val parentGini = gini(n0, n1)
        if (depth >= maxDepth || n < minCount || n0 == 0L || n1 == 0L)
          nodes(path) = WLeaf(n0, n1)
        else {
          // per feature: prefix-sum the bin histogram; candidate i splits
          // left = bins <= i. Deterministic tie-break: best weighted gini,
          // then feature name, then threshold index.
          var best: Option[(Double, String, Int)] = None
          features.foreach { case (f, g) =>
            val byBin = rows.filter(_.getString(1) == f)
              .groupBy(_.getInt(2))
              .map { case (b, rs) =>
                b -> (rs.filter(_.getInt(3) == 0).map(_.getLong(4)).sum,
                  rs.filter(_.getInt(3) == 1).map(_.getLong(4)).sum)
              }
            var l0 = 0L; var l1 = 0L
            (0 until g.n).foreach { i =>
              val (b0, b1) = byBin.getOrElse(i, (0L, 0L))
              l0 += b0; l1 += b1
              val (r0, r1) = (n0 - l0, n1 - l1)
              if (l0 + l1 > 0 && r0 + r1 > 0) {
                val w = ((l0 + l1) * gini(l0, l1) +
                  (r0 + r1) * gini(r0, r1)) / n.toDouble
                val cand = (w, f, i)
                val better = best match {
                  case None => true
                  case Some((bw, bf, bi)) =>
                    w < bw - 1e-15 || (math.abs(w - bw) <= 1e-15 &&
                      (f < bf || (f == bf && i < bi)))
                }
                if (better) best = Some(cand)
              }
            }
          }
          best match {
            case Some((w, f, i)) if parentGini - w > minGain =>
              nodes(path) = WInner(f, i, path + "L", path + "R")
              nodes(path + "L") = WOpen(depth + 1)
              nodes(path + "R") = WOpen(depth + 1)
            case _ => nodes(path) = WLeaf(n0, n1)
          }
        }
      }
    }

    binned.unpersist(blocking = false)
    def build(path: String): Node = nodes(path) match {
      case WLeaf(n0, n1) => Leaf(n0, n1)
      case WInner(f, i, l, r) =>
        Inner(f, gridOf(f).threshold(i), build(l), build(r))
      case WOpen(_) => sys.error("unreachable: open node after training")
    }
    build("")
  }
}
