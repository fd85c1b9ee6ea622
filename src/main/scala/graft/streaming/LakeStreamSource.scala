package graft.streaming

import graft.lake.LakeDataset
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SQLContext}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a lake dataset — the read-side twin of
  * [[LakeSink]]: `spark.readStream.format("lake").load(root)` tails the
  * manifest log, treating committed VERSIONS as offsets.
  *
  * Batch semantics:
  *  - The first batch is the full snapshot at the source's current version
  *    (Delta's initial-snapshot behavior).
  *  - Every later batch is the NET inserted rows between two versions,
  *    computed by the manifest-diff change feed ([[LakeDataset.changes]]):
  *    only fragments added in the range are read, so a batch costs IO
  *    proportional to what was committed, never to the table.
  *  - Commits that deleted or rewrote rows poison an append-only tail; the
  *    source refuses them (metadata-only check against the commit log)
  *    unless the reader opted in with `skipChangeCommits=true` — Delta's
  *    contract. Compaction / z-order / index builds are net-invisible to
  *    the diff and stream through without the option.
  *
  * Exactly-once: offsets are versions; the engine checkpoints them, and
  * `getBatch` is a pure function of (startVersion, endVersion] over
  * immutable manifests — replays reproduce the same rows. */
final class LakeStreamSource(sqlContext: SQLContext, root: String,
    skipChangeCommits: Boolean) extends Source {

  private val spark = sqlContext.sparkSession

  override val schema: StructType =
    LakeDataset.open(spark, root).schema

  override def getOffset: Option[LegacyOffset] =
    Some(LongOffset(LakeDataset.open(spark, root).version))

  private def versionOf(o: LegacyOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[LegacyOffset],
      end: LegacyOffset): DataFrame = {
    val endV = versionOf(end)
    val ds = LakeDataset.open(spark, root)
    val batch = start match {
      case None => ds.readVersion(endV) // initial snapshot
      case Some(s) =>
        val startV = versionOf(s)
        if (!skipChangeCommits) {
          val changers = ds.changeCommitsBetween(startV, endV)
          require(changers.isEmpty,
            s"lake stream at $root: versions ${changers.map(_._1).mkString(",")} " +
              s"contain non-append operations (${changers.map(_._2).distinct.mkString(", ")}); " +
              "set skipChangeCommits=true to stream net inserts only")
        }
        ds.changes(startV, endV)
          .filter(col("_change_type") === "insert")
          .drop("_rowid", "_change_type")
    }
    // Schema evolution mid-stream changes the output shape; fail with the
    // real reason instead of the engine's attribute-mismatch assertion.
    // Full StructType comparison (round-4 ADVICE: a name-only guard let
    // type changes like int→long through to the engine assertion), pinned
    // to the BATCH's end-version schema so the remedy is accurate:
    //  - evolution inside this batch range → restarting picks up the new
    //    schema (Delta's contract);
    //  - a checkpointed batch replayed AFTER evolution (end version
    //    predates the current schema) → restarting cannot clear it; the
    //    stream must resume from a fresh checkpoint.
    val endSchema = ds.checkout(endV).schema
    if (endSchema != schema) {
      val remedy =
        if (ds.schema == schema)
          "this checkpointed batch predates the current schema and cannot " +
            "replay against it; resume from a fresh checkpoint"
        else "restart the stream to pick up the new schema"
      throw new IllegalStateException(
        s"lake stream at $root: dataset schema changed " +
          s"($schema -> $endSchema); $remedy")
    }
    GraftSqlShims.asStreamingFrame(batch)
  }

  override def stop(): Unit = ()
}

object LakeStreamSource {
  /** Case-insensitive option lookup (DataStreamReader preserves key case). */
  private[streaming] def opt(parameters: Map[String, String],
      key: String): Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v
    }

  def forOptions(sqlContext: SQLContext,
      parameters: Map[String, String]): LakeStreamSource = {
    val root = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException("lake stream: 'path' is required"))
    new LakeStreamSource(sqlContext, root,
      opt(parameters, "skipChangeCommits").exists(_.toBoolean))
  }

  def sourceSchema(sqlContext: SQLContext,
      parameters: Map[String, String]): StructType = {
    val root = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException("lake stream: 'path' is required"))
    LakeDataset.open(
      sqlContext.sparkSession.asInstanceOf[SparkSession], root).schema
  }
}
