package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` shape (event_id, ts,
  * user_id, event_type, value, props). The reference has no streaming
  * (SURVEY §2.4); this is north-star surface: the same transforms run
  * identically on a batch DataFrame and on a `readStream` source —
  * declare-once, run-either.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped, state evicted); sessionization keys
  * state by user_id — state size is O(active users), and event-time timeout
  * closes sessions without waiting for new input per key.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long, total_value: Double)

  /** Internal running-session state (public: the state encoder's generated
    * code must be able to reach the accessors). */
  final case class SessionAcc(start: Long, end: Long, n: Long,
      total: Double)

  /** Tumbling-window aggregation with a watermark; works on both batch and
    * streaming inputs (same plan, streaming adds state eviction). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exactly-once-per-key dedup: drops repeats of `idCols` seen
    * within the watermark window (state evicted past it — bounded memory,
    * the streaming half of the dedup mandate; at-least-once sources become
    * effectively-once sinks). */
  def dedupStream(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stream-stream interval join: pair each right-side event with the
    * left-side events of the same user in the `beforeMinutes` window
    * leading up to it. Works identically on batch frames and on two
    * `readStream` sources; in streaming, BOTH sides carry watermarks and
    * the join condition bounds event-time distance, so Spark derives state
    * eviction for each side — state is O(events within the watermark), not
    * O(stream). Shuffles both sides by user_id once. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      beforeMinutes: Int = 30, watermark: String = "2 hours"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"),
        col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("l_user") === col("r_user") &&
      col("l_ts") <= col("r_ts") &&
      col("l_ts") >= col("r_ts") - expr(s"INTERVAL $beforeMinutes MINUTES"))
  }

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]], but
    * every right-side event (the preserved side, e.g. a purchase) emits
    * even when NO left-side event precedes it in the window — the "which
    * conversions had no touchpoint" question an inner join cannot ask.
    * In streaming, Spark holds the preserved row until BOTH watermarks
    * pass its window (only then is "no match" final) and emits it with
    * nulls; batch is a plain left_outer with the same condition — one
    * declaration, both modes, state still watermark-bounded. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame,
      beforeMinutes: Int = 30, watermark: String = "2 hours"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"),
        col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    r.join(l, col("l_user") === col("r_user") &&
      col("l_ts") <= col("r_ts") &&
      col("l_ts") >= col("r_ts") - expr(s"INTERVAL $beforeMinutes MINUTES"),
      "left_outer")
  }

  /** Gap-based sessionization with mapGroupsWithState-family custom state:
    * a session closes when no event arrives within `gapMinutes` (event
    * time, enforced by watermark timeout). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var acc = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              acc match {
                // within the gap of the open session's INTERVAL: a late
                // event can extend the start backwards, not just the end
                case Some(a) if t >= a.start - gapMs && t - a.end <= gapMs =>
                  acc = Some(a.copy(start = math.min(a.start, t),
                    end = math.max(a.end, t), n = a.n + 1,
                    total = a.total + e.value))
                // straggler more than a gap OLDER than the open session:
                // its own session, already closed by definition (anything
                // that could join it is older still). Without this arm the
                // `t - a.end <= gap` test is vacuously true for the past
                // and a 3-hour-old event would merge into today's session.
                case Some(a) if t < a.start - gapMs =>
                  closed ::= Session(user, new Timestamp(t),
                    new Timestamp(t), 1, e.value)
                case Some(a) =>
                  closed ::= Session(user, new Timestamp(a.start),
                    new Timestamp(a.end), a.n, a.total)
                  acc = Some(SessionAcc(t, t, 1, e.value))
                case None =>
                  acc = Some(SessionAcc(t, t, 1, e.value))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
