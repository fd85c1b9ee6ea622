package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One incremental refresh: the base-version window it consumed and how
  * many view groups it rewrote / removed. */
final case class MvRefreshStats(
    fromVersion: Long,
    toVersion: Long,
    upsertedGroups: Long,
    removedGroups: Long)

/** Incrementally-maintained materialized view over a [[LakeDataset]]:
  * `SELECT keys, count(*), sum(c).., max(c).., min(c).. GROUP BY keys`,
  * kept current from the base table's change feed instead of full
  * recompute.
  *
  * The view is itself a lake dataset with one row per live group —
  * `keys..., mv_cnt, sum_<c>.., max_<c>..` — and the base version it is
  * current to rides in the view manifest's `properties` under
  * `mv.base.version`, so the refresh cursor commits atomically with the
  * refreshed state (a crash between data and cursor can only replay the
  * same idempotent window, never skip one).
  *
  * Refresh cost is proportional to the CHANGES, never to the base table:
  *   - [[LakeDataset.changes]] reads only fragments touched in
  *     `(from, to]` (the manifest diff bounds IO) and nets out
  *     rewritten-but-identical rows, so compaction/z-order churn is free;
  *   - the signed delta aggregation shuffles only changed rows, with
  *     map-side partial combine, down to one row per dirty group;
  *   - the view merge joins that (dirty-groups-sized) frame against the
  *     view and rewrites only fragments holding dirty groups
  *     ([[LakeDataset.mergeInsert]]'s touched-file pruning);
  *   - MAX under deletion is not incrementally computable, so exactly the
  *     groups that lost rows are recomputed by ONE semi-join-pruned scan
  *     of the base restricted to those groups (zonemap skipping applies);
  *     insert-only deltas fold `greatest(old, delta)` with zero base IO.
  *
  * COUNT/SUM are self-maintainable, AVG derives as sum/cnt at read time;
  * this is the standard algebraic-aggregate MV maintenance split (Gupta &
  * Mumick, "Maintenance of Materialized Views", IEEE DE Bulletin 1995).
  * The reference engine has no MV machinery — this is a beyond-reference
  * capability built from the lake's own CDF + merge primitives. */
final class MaterializedView private (
    spark: SparkSession,
    val base: LakeDataset,
    val view: LakeDataset,
    val keys: Seq[String],
    val sumCols: Seq[String],
    val maxCols: Seq[String],
    val minCols: Seq[String]) {

  import MaterializedView._

  /** Base version the view state is current to. */
  def baseVersion: Long =
    view.manifest.properties(PropBaseVersion).toLong

  /** Current view contents (one row per live group). The `mv_cnt > 0`
    * filter hides groups that netted to zero in a refresh whose
    * housekeeping delete has not landed yet (e.g. a crash between the
    * merge+cursor commit and the delete commit) — those rows are dead,
    * not wrong, and the next refresh's delete collects them. */
  def read(): DataFrame = view.read().filter(col("mv_cnt") > 0)

  /** Bring the view up to the base's current version by applying the
    * change feed; no-op (and no commit) when already current. */
  def refresh(): MvRefreshStats = {
    val from = baseVersion
    val to = base.version
    if (from == to) return MvRefreshStats(from, to, 0L, 0L)
    foldDelta(base.changes(from, to), base.read(), view, keys,
      sumCols, maxCols, minCols, Map(PropBaseVersion -> to.toString),
      from, to)
  }
}

object MaterializedView {

  /** Shared signed-delta fold — the algebraic-aggregate maintenance core
    * used by both the single-table view and [[JoinMaterializedView]].
    * `feed` is a CDF-shaped frame (view input columns + `_change_type`);
    * `full` lazily recomputes MAX/MIN source rows for groups that lost
    * rows (only evaluated when such groups exist). The `cursor` props ride
    * in the same manifest swap as the merged state: a crash can never
    * leave data applied with the cursor behind (which would double-apply
    * the window on replay) or vice versa. Net-empty windows (pure layout
    * churn) advance the cursor with a metadata-only commit. Concurrent
    * refreshes of one view are a single-writer contract, as with the
    * streaming sinks. */
  private[lake] def foldDelta(feed: DataFrame, full: => DataFrame,
      view: LakeDataset, keys: Seq[String], sumCols: Seq[String],
      maxCols: Seq[String], minCols: Seq[String],
      cursor: Map[String, String], from: Long, to: Long): MvRefreshStats = {
    val signed = feed.withColumn("_sign",
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L)))
    val deltaAggs =
      Seq(sum(col("_sign")).as("_d_cnt")) ++
        sumCols.map(c => sum(col(c) * col("_sign")).as(s"_d_sum_$c")) ++
        maxCols.map(c =>
          max(when(col("_sign") === 1L, col(c))).as(s"_d_max_$c")) ++
        minCols.map(c =>
          min(when(col("_sign") === 1L, col(c))).as(s"_d_min_$c")) ++
        Seq(max(col("_sign") === -1L).as("_d_removed"))
    // Pin the delta: one row per dirty group (never base-table-sized), but
    // its lineage is the whole CDF read + aggregation, and it is evaluated
    // again for the removed-groups probe, the merge frame, and every action
    // inside mergeInsert (dup-key gate, touched-file probe, matched count,
    // rewrite join, insert anti-join) — measured 4.9 s of lake_mv_rewrite's
    // 7.6 s wall at sf0.1 was exactly this recomputation (guide §1/§5:
    // don't recompute what a cheap bounded pin can hold).
    val delta = graft.Materialize.pin(signed.groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*))
    // everything below can throw (the removed-groups probe, the eager pin
    // of `merged`) — this try's finally releases delta's blocks on those
    // paths too, not just after mergedPinned exists
    try {

    // Groups that lost rows: MAX/MIN may have moved — recompute those
    // groups (and only those) from the full input. Semi-join keeps the
    // scan prunable by zonemaps/partitioning.
    val extremeNames =
      maxCols.map(c => (s"_r_max_$c", s"_d_max_$c", max(col(c)))) ++
        minCols.map(c => (s"_r_min_$c", s"_d_min_$c", min(col(c))))
    val withRecompute =
      if (extremeNames.isEmpty || delta.filter(col("_d_removed")).isEmpty) {
        extremeNames.foldLeft(delta) { case (df, (r, d, _)) =>
          df.withColumn(r, lit(null).cast(df.schema(d).dataType))
        }
      } else {
        val dirty = delta.filter(col("_d_removed")).select(keys.map(col): _*)
        val reAggs = extremeNames.map { case (r, _, agg) => agg.as(r) }
        val recomputed = full
          .join(dirty, keys, "left_semi")
          .groupBy(keys.map(col): _*)
          .agg(reAggs.head, reAggs.tail: _*)
        delta.join(recomputed, keys, "left")
      }

    // Pinned for the same reason as `delta`: dirty-groups-sized, consumed
    // by isEmpty + mergeInsert's five actions. The recompute branch's
    // semi-joined base scan runs ONCE here instead of per action.
    val merged = withRecompute.join(view.read(), keys, "left")
      .select(
        keys.map(col) ++
          Seq((coalesce(col("mv_cnt"), lit(0L)) + col("_d_cnt")).as("mv_cnt")) ++
          sumCols.map(c =>
            (coalesce(col(s"sum_$c"), lit(0L)) +
              coalesce(col(s"_d_sum_$c"), lit(0L))).as(s"sum_$c")) ++
          maxCols.map(c =>
            when(col("_d_removed"), col(s"_r_max_$c"))
              .otherwise(greatest(col(s"max_$c"), col(s"_d_max_$c")))
              .as(s"max_$c")) ++
          minCols.map(c =>
            when(col("_d_removed"), col(s"_r_min_$c"))
              .otherwise(least(col(s"min_$c"), col(s"_d_min_$c")))
              .as(s"min_$c")): _*)
    val mergedPinned = graft.Materialize.pin(merged)
    try {
      if (mergedPinned.isEmpty) {
        view.setProperties(cursor)
        return MvRefreshStats(from, to, 0L, 0L)
      }
      val (matched, inserted) = view.mergeInsert(mergedPinned, keys,
        extraProps = cursor)
      // housekeeping, idempotent: groups that netted to zero are invisible
      // to read() already; the delete just reclaims their rows
      val removed = view.delete("mv_cnt <= 0")
      MvRefreshStats(from, to, matched + inserted, removed)
    } finally {
      graft.Materialize.unpin(mergedPinned)
    }
    } finally {
      graft.Materialize.unpin(delta)
    }
  }

  val PropBaseVersion = "mv.base.version"
  val PropBasePath = "mv.base.path"
  val PropKeys = "mv.keys"
  val PropSumCols = "mv.sum.cols"
  val PropMaxCols = "mv.max.cols"
  val PropMinCols = "mv.min.cols"

  private def csv(cols: Seq[String]): String = cols.mkString(",")
  private def uncsv(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private def stateOf(base: LakeDataset, keys: Seq[String],
      sumCols: Seq[String], maxCols: Seq[String],
      minCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("mv_cnt")) ++
      sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c")) ++
      minCols.map(c => min(col(c)).as(s"min_$c"))
    base.read().groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full initial build at the base's current version. */
  def create(spark: SparkSession, base: LakeDataset, viewRoot: String,
      keys: Seq[String], sumCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): MaterializedView = {
    val snapshotV = base.version
    val state = stateOf(base, keys, sumCols, maxCols, minCols)
    val view = LakeDataset.create(spark, viewRoot,
      StructType(state.schema.fields.map(_.copy(nullable = true))))
    // The full definition rides in the view's own properties, so `open`
    // (and the SQL `CALL lake.system.mv_refresh(view)` door) needs no
    // caller-supplied definition to re-derive later refreshes. The
    // properties land in the SAME commit as the initial state: one
    // manifest swap instead of two, and no window where the view has
    // data but no cursor.
    view.append(state, Map(
      PropBaseVersion -> snapshotV.toString,
      PropBasePath -> base.root,
      PropKeys -> csv(keys),
      PropSumCols -> csv(sumCols),
      PropMaxCols -> csv(maxCols),
      PropMinCols -> csv(minCols)))
    new MaterializedView(spark, base, view, keys, sumCols, maxCols, minCols)
  }

  /** Reattach to an existing view; the definition, base location, state
    * and refresh cursor all come from the view dataset itself. */
  def open(spark: SparkSession, viewRoot: String): MaterializedView = {
    val view = LakeDataset.open(spark, viewRoot)
    val props = view.manifest.properties
    require(props.contains(PropBaseVersion) && props.contains(PropBasePath),
      s"$viewRoot is not a materialized view (missing mv.* properties)")
    val base = LakeDataset.open(spark, props(PropBasePath))
    new MaterializedView(spark, base, view,
      uncsv(props(PropKeys)),
      uncsv(props.getOrElse(PropSumCols, "")),
      uncsv(props.getOrElse(PropMaxCols, "")),
      uncsv(props.getOrElse(PropMinCols, "")))
  }

  /** Full recompute of what the view SHOULD hold right now — the oracle
    * for specs and for a user-side consistency check. */
  def expected(base: LakeDataset, keys: Seq[String],
      sumCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil): DataFrame =
    stateOf(base, keys, sumCols, maxCols, minCols)
}
