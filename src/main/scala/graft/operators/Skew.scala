package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; explicit
  * salting remains the tool when (a) the small side must be replicated
  * against a known-hot key set, or (b) a two-phase aggregation needs the
  * hot groups spread before the final combine. Both are pure DataFrame
  * rewrites — no custom physical operators.
  */
object Skew {

  /** Salted equi-join: the left (large, skewed) side gets a random salt in
    * [0, factor); the right side is exploded `factor`× so every
    * (key, salt) pair finds its match. Result equals a plain inner join on
    * `key`, but the hot key's rows spread over `factor` reducers.
    *
    * Right-side replication costs `factor`× its size — use for dimension-
    * sized right sides (the same regime where broadcast stops fitting but
    * the key histogram is ugly). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor >= 1)
    // withColumn would silently overwrite (then drop) a caller's _salt
    require(!left.columns.contains("_salt") &&
      !right.columns.contains("_salt"),
      "saltedJoin reserves the _salt column name")
    val saltedLeft = left.withColumn("_salt",
      (rand(seed = 42) * factor).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation with explicit salting: phase 1
    * aggregates (key, salt) groups, phase 2 combines per key. `aggs` maps
    * output column → (phase1 agg of input, phase2 combine of phase1).
    * Catalyst already emits partial aggregation for sums/counts; this shape
    * is for aggregates whose partial state is itself a heavy value (e.g.
    * collect-like or sketch merges) on hot keys. */
  def saltedAgg(df: DataFrame, key: String, salt: Int)(
      phase1: Seq[(String, Column)], phase2: Seq[(String, Column)]): DataFrame = {
    require(salt >= 1 && phase1.nonEmpty && phase2.nonEmpty)
    val p1 = df
      .withColumn("_salt", (rand(seed = 42) * salt).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(phase1.head._2.as(phase1.head._1),
        phase1.tail.map { case (n, c) => c.as(n) }: _*)
    p1.groupBy(col(key))
      .agg(phase2.head._2.as(phase2.head._1),
        phase2.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
