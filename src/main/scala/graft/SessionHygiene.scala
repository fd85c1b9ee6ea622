package graft

import org.apache.spark.sql.SparkSession

/** Per-query session cleanup for long-lived harness sessions (Bench, Verify).
  *
  * Pipeline queries materialize intermediate relations with
  * `localCheckpoint()` (dedup signatures/edges, the memoized IVF index).
  * Those blocks live in the block manager until explicitly unpersisted; a
  * session that runs the whole registry back-to-back (the driver bench runs
  * all queries alphabetically) otherwise accumulates them until every later
  * query pays GC/block-manager pressure — round-2 verdict measured q7/q9 at
  * 13-15 s in-session vs 0.9 s standalone from exactly this.
  */
object SessionHygiene {

  /** Release query-scoped persisted state: clear the memoized IVF index
    * (so nothing references the checkpoints) and unpersist every persistent
    * RDD, which covers all `localCheckpoint` blocks. Safe between queries —
    * registry queries never share persisted state across calls.
    *
    * The unpersist is BLOCKING and followed by an explicit GC: broadcast
    * blocks (every broadcast join leaves one) are only released when the
    * ContextCleaner notices the weak reference die — i.e. after a GC — and
    * on the bench's 48 GiB heap organic GCs are rare, so ~300 entries of
    * broadcasts/checkpoint state piled up in the block manager. Measured:
    * reftpch_q21_x167 18.8 s late in the full run vs 3.8 s isolated, on
    * identical code. The sweep runs BETWEEN entries — never inside a timed
    * region — so this trades untimed wall for each query measuring from
    * the same clean state an isolated run sees. */
  def sweep(spark: SparkSession): Unit = {
    graft.pipeline.Ann.clearIvfCache(spark)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }
}
