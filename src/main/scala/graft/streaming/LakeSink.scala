package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.lake.LakeDataset

/** Structured Streaming → lake ingestion: a `foreachBatch` handler that
  * lands every micro-batch as a versioned lake commit with exactly-once
  * semantics (beyond-reference north star: the reference has no streaming,
  * SURVEY §2.4; continuous ingest into the versioned table is the missing
  * WAL-shaped front door for an LLM-data pipeline).
  *
  * foreachBatch is at-least-once — after a failure the same batchId can
  * replay. [[LakeDataset.appendStreamingBatch]] commits the data AND the
  * per-query batch high-water mark in one atomic manifest swap, so replays
  * are detected and skipped: at-least-once delivery becomes exactly-once
  * table state. Compose upstream with
  * [[EventStream.dedupStream]] for source-side duplicates.
  *
  * {{{
  *   events.writeStream
  *     .foreachBatch(LakeSink.appendTo(root, "events_ingest"))
  *     .start()
  * }}}
  */
object LakeSink {

  /** Create-on-first-batch append sink. `branch` lands the stream on a
    * branch head instead of main (the write-side twin of the source's
    * `option("branch", ...)`) — the branch must exist; exactly-once
    * replay detection runs against the branch's own manifest chain. */
  def appendTo(root: String, queryKey: String = "default",
      branch: Option[String] = None): (DataFrame, Long) => Unit = {
    (df, batchId) =>
      val spark = df.sparkSession
      val ds = branch match {
        case Some(b) => LakeDataset.openBranch(spark, root, b)
        case None =>
          if (LakeDataset.exists(root)) LakeDataset.open(spark, root)
          else LakeDataset.create(spark, root, df.schema)
      }
      ds.appendStreamingBatch(df, queryKey, batchId)
      ()
  }
}
