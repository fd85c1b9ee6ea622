package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single nearest right row at-or-before
  * (backward) / at-or-after (forward) its timestamp, per key — the
  * trades-vs-quotes operator (pandas merge_asof / DuckDB ASOF JOIN
  * semantics; the reference's SQL surface has no counterpart, so this is
  * pipeline-operator territory like the dedup family).
  *
  * NOT implemented as a range join: both sides are tagged, unioned, and
  * swept by ONE keyed window (`last(right_struct) IGNORE NULLS` over rows
  * up to the current one), so the cost is a single shuffle of both inputs
  * on the key plus a per-key sort. A naive `l.ts >= r.ts` theta join
  * materializes O(|L|·|R| / keys) candidate pairs before picking the max —
  * at 100 TB that candidate set, not the data, is the bottleneck. The
  * window form also inherits AQE skew splitting on the shuffle.
  *
  * Determinism: right rows must be unique per (keys, ts) — pre-aggregate
  * duplicates away (the registry query shows the pattern); otherwise ties
  * resolve by arrival order.
  *
  * Output: every left column, then for each payload column `p` the matched
  * right value `p` (NULL when no match / outside tolerance), then the
  * matched right timestamp as `<rightTs>_matched`.
  */
object AsofJoin {

  /** Latest right row with `rightTs <= leftTs` (within `toleranceSeconds`
    * when given), per key. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, toleranceSeconds,
      fwd = false)

  /** Earliest right row with `rightTs >= leftTs` (within tolerance). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, toleranceSeconds,
      fwd = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceSeconds: Option[Long], fwd: Boolean): DataFrame = {
    require(payload.nonEmpty, "asof: name at least one right payload column")
    val matchedTs = s"${rightTs}_matched"
    val clash = (payload :+ matchedTs).filter(left.columns.contains)
    require(clash.isEmpty,
      s"asof: rename right columns colliding with left: ${clash.mkString(",")}")
    val reserved = Seq("__asof_ts", "__asof_src", "__asof_r", "__asof_m")
    val taken = (left.columns ++ right.columns).filter(reserved.contains)
    require(taken.isEmpty,
      s"asof: inputs may not use reserved columns: ${taken.mkString(",")}")

    val leftCols = left.columns.toSeq
    val l2 = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_src", lit(1))
    val r2 = right.select(
      (keys.map(col) :+ col(rightTs).as("__asof_ts")) :+
        struct(col(rightTs).as(matchedTs) +: payload.map(col): _*)
          .as("__asof_r"): _*)
      .withColumn("__asof_src", lit(0))

    // union both sides; left-only columns are NULL on right rows and the
    // right struct is NULL on left rows — exactly what IGNORE NULLS needs
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // at equal timestamps the right row sorts FIRST, so `last(...)` over
    // rows-up-to-current gives inclusive (>= / <=) match semantics
    val ord =
      if (fwd) Seq(col("__asof_ts").desc, col("__asof_src").asc)
      else Seq(col("__asof_ts").asc, col("__asof_src").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = unioned
      .withColumn("__asof_m", last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_src") === 1)

    val gap =
      if (fwd) unix_micros(col(s"__asof_m.$matchedTs")) - unix_micros(col(leftTs))
      else unix_micros(col(leftTs)) - unix_micros(col(s"__asof_m.$matchedTs"))
    val within = toleranceSeconds match {
      case None => col("__asof_m").isNotNull
      case Some(t) => col("__asof_m").isNotNull && gap <= t * 1000000L
    }
    swept.select(leftCols.map(col) ++
      (payload :+ matchedTs).map(p =>
        when(within, col(s"__asof_m.$p")).as(p)): _*)
  }
}
