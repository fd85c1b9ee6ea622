package graft

import org.apache.spark.sql.DataFrame

/** Pin an intermediate that the surrounding algorithm re-reads — iterative
  * join rounds (dedup label propagation), memoized indexes (IVF), edge
  * lists. Without pinning, round i re-executes a lineage of i nested
  * join+agg stages (quadratic total work).
  *
  * Two residency modes:
  *  - default (`local[...]`, tests, bench): `localCheckpoint` — blocks live
  *    in the executor block manager. Fast, but lineage is truncated, so on
  *    a real cluster a lost executor makes the blocks unrecoverable.
  *  - `spark.graft.checkpointDir=<hdfs://...>`: reliable `checkpoint` to
  *    that filesystem — the cluster-safe mode; intermediates survive
  *    executor loss and feed as many downstream stages as needed. This is
  *    the same persist-the-intermediate discipline `FtsIndex`/`VectorIndex`
  *    practice with their parquet segment files.
  */
object Materialize {
  def pin(df: DataFrame, eager: Boolean = true): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) if dir.nonEmpty =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir appends a per-app UUID subdir; only (re)set when
        // unset so repeated pins share one directory tree.
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }

  /** Release a pinned frame's storage NOW. `Dataset.unpersist` only
    * consults the CacheManager, so it is a no-op for `localCheckpoint` /
    * `checkpoint` pins (disassembled Spark 4.1.2: unpersist →
    * `cacheManager.uncacheQuery` and nothing else) — the blocks otherwise
    * sit in the block manager until the ContextCleaner happens to GC the
    * RDD. unpin finds the pin's LogicalRDD leaves in the analyzed plan and
    * unpersists the underlying RDDs directly; it works on the pinned frame
    * itself or any projection derived from it. Only call when every
    * consumer of the pin has run — a pinned RDD cannot recompute. */
  def unpin(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    /** `df.pinned()` — chainable [[Materialize.pin]]. */
    def pinned(): DataFrame = pin(df)
    /** `df.unpinned()` — chainable [[Materialize.unpin]]. */
    def unpinned(): Unit = unpin(df)
  }
}
