package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One dimension of a star-join view: `fact.factCol = dim(root).dimCol`,
  * with `expose` the dim columns the view carries (grouping keys live
  * here — e.g. expose `c_mktsegment` from a customer dim). Exposed names
  * must be distinct from fact column names (the joined frame is flat). */
final case class MvDim(root: String, factCol: String, dimCol: String,
    expose: Seq[String])

/** Incrementally-maintained materialized view over a STAR JOIN of lake
  * datasets: `SELECT keys, count(*), sum(m).. FROM fact JOIN dim1 ON ..
  * JOIN dim2 ON .. GROUP BY keys` — the SPJG view class of
  * answering-queries-using-views (Goldstein & Larson, SIGMOD 2001 §3),
  * maintained like the single-table [[MaterializedView]] (Gupta & Mumick
  * 1995): measures come from the fact, keys from fact or exposed dim
  * columns.
  *
  * Maintenance splits by which side changed:
  *   - FACT changes (the 100 TB common case — append-heavy facts over
  *     slowly-changing dims): the fact's CDF window joins the CURRENT
  *     dims — cost proportional to the changed rows × dim lookup, never
  *     to the fact — and the signed delta folds into the view through
  *     [[MaterializedView.foldDelta]], exactly as for a single table.
  *     This is sound because an unchanged dim row joins a fact delta row
  *     the same way it joined the original: insert deltas add the joined
  *     row once, delete deltas retract it once.
  *   - DIM changes: a changed dim row fans out to every matching fact
  *     row, so the fact feed is no longer the view delta. The view
  *     records each dim's version in its cursor and `refresh()` falls
  *     back to a full rebuild when any moved — honest and bounded (the
  *     rebuild is one shuffle of the join), and loud in the stats
  *     (`removedGroups = -1` marks the rebuild path).
  *
  * The fact cursor and the per-dim version vector commit atomically with
  * the merged state (mergeInsert extraProps), so replays are idempotent.
  * The view is itself a lake dataset (`keys..., mv_cnt, sum_<m>..`), so
  * [[MvRewrite]] answers matching star-join aggregates from it
  * transparently. */
final class JoinMaterializedView private (
    spark: SparkSession,
    val fact: LakeDataset,
    val dims: Seq[(MvDim, LakeDataset)],
    val view: LakeDataset,
    val keys: Seq[String],
    val sumCols: Seq[String],
    val maxCols: Seq[String],
    val minCols: Seq[String]) {

  import JoinMaterializedView._

  /** Fact version the view state is current to. */
  def factVersion: Long =
    view.manifest.properties(PropFactVersion).toLong

  /** Dim versions the view state is current to (definition order). */
  def dimVersions: Seq[Long] =
    view.manifest.properties(PropDimVersions)
      .split(',').filter(_.nonEmpty).map(_.toLong).toSeq

  /** Current view contents (one row per live group; see
    * [[MaterializedView.read]] on the `mv_cnt > 0` guard). */
  def read(): DataFrame = view.read().filter(col("mv_cnt") > 0)

  /** The star join of `factSide` (full read or a CDF window — extra
    * metadata columns like `_change_type` pass through) against the given
    * dim handles. */
  private def joined(factSide: DataFrame,
      dimDs: Seq[(MvDim, LakeDataset)]): DataFrame =
    dimDs.foldLeft(factSide) { case (acc, (d, ds)) =>
      val dimDf = ds.read()
        .select((d.dimCol +: d.expose).distinct.map(col): _*)
      acc.join(dimDf, acc(d.factCol) === dimDf(d.dimCol), "inner")
        .drop(dimDf(d.dimCol))
    }

  /** Bring the view current. Fact-only changes fold incrementally; any
    * dim movement triggers the documented full-rebuild fallback. Fact and
    * dims are RE-OPENED here so concurrent writers through other handles
    * are seen (a cached manifest must never mask a moved dim — that would
    * silently fold a delta against the wrong dim rows). */
  def refresh(): MvRefreshStats = {
    val factHead = LakeDataset.open(spark, fact.root)
    val dimHeads = dims.map { case (d, ds) =>
      d -> LakeDataset.open(spark, ds.root) }
    val from = factVersion
    val to = factHead.version
    val dimVs = dimHeads.map(_._2.version)
    val cursor = Map(PropFactVersion -> to.toString,
      PropDimVersions -> dimVs.mkString(","))
    if (dimVersions != dimVs) {
      val state = stateOf(joined(factHead.read(), dimHeads), keys,
        sumCols, maxCols, minCols)
      view.overwrite(state)
      view.setProperties(cursor)
      return MvRefreshStats(from, to, state.count(), -1L)
    }
    if (from == to) return MvRefreshStats(from, to, 0L, 0L)
    MaterializedView.foldDelta(
      joined(factHead.changes(from, to), dimHeads),
      joined(factHead.read(), dimHeads), view,
      keys, sumCols, maxCols, minCols, cursor, from, to)
  }
}

object JoinMaterializedView {
  val PropFactPath = "mv.join.fact.path"
  val PropFactVersion = "mv.join.fact.version"
  val PropDims = "mv.join.dims" // root|factCol|dimCol|e1+e2;...
  val PropDimVersions = "mv.join.dim.versions"
  val PropKeys = "mv.join.keys"
  val PropSumCols = "mv.join.sum.cols"
  val PropMaxCols = "mv.join.max.cols"
  val PropMinCols = "mv.join.min.cols"

  private def csv(cols: Seq[String]): String = cols.mkString(",")
  private def uncsv(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  // the dim-spec fields ride in one property string with '|' ';' '+' as
  // separators — all three are legal in URIs/paths, so every field is
  // %-escaped (URL-style, '%' first) to round-trip any root verbatim
  private def esc(s: String): String =
    s.replace("%", "%25").replace("|", "%7C")
      .replace(";", "%3B").replace("+", "%2B")
  private def unesc(s: String): String =
    s.replace("%2B", "+").replace("%3B", ";")
      .replace("%7C", "|").replace("%25", "%")

  private def encodeDims(dims: Seq[MvDim]): String =
    dims.map(d =>
      s"${esc(d.root)}|${esc(d.factCol)}|${esc(d.dimCol)}|" +
        d.expose.map(esc).mkString("+"))
      .mkString(";")

  private def decodeDims(s: String): Seq[MvDim] =
    s.split(';').filter(_.nonEmpty).toSeq.map { part =>
      val Array(root, fc, dc, ex) = part.split('|').padTo(4, "")
      MvDim(unesc(root), unesc(fc), unesc(dc),
        ex.split('+').filter(_.nonEmpty).toSeq.map(unesc))
    }

  private[lake] def stateOf(joinedDf: DataFrame, keys: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String],
      minCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("mv_cnt")) ++
      sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c")) ++
      minCols.map(c => min(col(c)).as(s"min_$c"))
    joinedDf.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full initial build at the fact's and dims' current versions. */
  def create(spark: SparkSession, fact: LakeDataset, dims: Seq[MvDim],
      viewRoot: String, keys: Seq[String], sumCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): JoinMaterializedView = {
    val dimDs = dims.map(d => d -> LakeDataset.open(spark, d.root))
    val factCols = fact.read().columns.toSet
    dims.foreach { d =>
      require(factCols.contains(d.factCol),
        s"fact has no join column ${d.factCol}")
      require(d.expose.forall(!factCols.contains(_)),
        s"exposed dim columns must not shadow fact columns (${d.expose})")
    }
    val factV = fact.version
    val dimVs = dimDs.map(_._2.version)
    val state = stateOf(
      dimDs.foldLeft(fact.read()) { case (acc, (d, ds)) =>
        val dimDf = ds.read()
          .select((d.dimCol +: d.expose).distinct.map(col): _*)
        acc.join(dimDf, acc(d.factCol) === dimDf(d.dimCol), "inner")
          .drop(dimDf(d.dimCol))
      }, keys, sumCols, maxCols, minCols)
    val view = LakeDataset.create(spark, viewRoot,
      StructType(state.schema.fields.map(_.copy(nullable = true))))
    // definition + cursor in the SAME commit as the initial state (see
    // MaterializedView.create): one manifest swap instead of two
    view.append(state, Map(
      PropFactVersion -> factV.toString,
      PropFactPath -> fact.root,
      PropDims -> encodeDims(dims),
      PropDimVersions -> dimVs.mkString(","),
      PropKeys -> csv(keys),
      PropSumCols -> csv(sumCols),
      PropMaxCols -> csv(maxCols),
      PropMinCols -> csv(minCols)))
    new JoinMaterializedView(spark, fact, dimDs, view,
      keys, sumCols, maxCols, minCols)
  }

  /** Reattach to an existing join view; the whole definition comes from
    * the view's own properties. */
  def open(spark: SparkSession, viewRoot: String): JoinMaterializedView = {
    val view = LakeDataset.open(spark, viewRoot)
    val props = view.manifest.properties
    require(props.contains(PropFactPath) && props.contains(PropFactVersion),
      s"$viewRoot is not a join materialized view (missing mv.join.*)")
    val fact = LakeDataset.open(spark, props(PropFactPath))
    val dims = decodeDims(props(PropDims))
      .map(d => d -> LakeDataset.open(spark, d.root))
    new JoinMaterializedView(spark, fact, dims, view,
      uncsv(props(PropKeys)),
      uncsv(props.getOrElse(PropSumCols, "")),
      uncsv(props.getOrElse(PropMaxCols, "")),
      uncsv(props.getOrElse(PropMinCols, "")))
  }

  /** Full recompute of what the view SHOULD hold right now — the oracle
    * for specs and user-side consistency checks. */
  def expected(spark: SparkSession, fact: LakeDataset, dims: Seq[MvDim],
      keys: Seq[String], sumCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil, minCols: Seq[String] = Nil): DataFrame =
    stateOf(
      dims.foldLeft(fact.read()) { case (acc, d) =>
        val ds = LakeDataset.open(spark, d.root)
        val dimDf = ds.read()
          .select((d.dimCol +: d.expose).distinct.map(col): _*)
        acc.join(dimDf, acc(d.factCol) === dimDf(d.dimCol), "inner")
          .drop(dimDf(d.dimCol))
      }, keys, sumCols, maxCols, minCols)
}
