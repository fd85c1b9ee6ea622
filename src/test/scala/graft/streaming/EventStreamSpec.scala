package graft.streaming

import java.sql.Timestamp

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg over a memory stream matches the batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      EventStream.Event(1, ts("2026-01-01 00:10:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2026-01-01 00:40:00"), 1, "click", 2.0),
      EventStream.Event(3, ts("2026-01-01 01:10:00"), 2, "view", 5.0),
      EventStream.Event(4, ts("2026-01-01 03:10:00"), 2, "view", 7.0))

    val stream = MemoryStream[EventStream.Event]
    val q = EventStream.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to finalize all windows
      stream.addData(EventStream.Event(9, ts("2026-01-01 09:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("win_agg")
        .filter(col("event_type").isin("click", "view"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStream.windowedAgg(events.toDF())
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(batch == Set(
        ("2026-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2026-01-01 01:00:00.0", "view", 1L, 5.0),
        ("2026-01-01 03:00:00.0", "view", 1L, 7.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch run and is watermark-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      EventStream.Event(1, ts("2026-01-01 00:05:00"), 1, "view", 1.0),
      EventStream.Event(2, ts("2026-01-01 00:20:00"), 1, "view", 2.0),
      EventStream.Event(3, ts("2026-01-01 00:50:00"), 1, "view", 4.0), // > 30 min before either purchase
      EventStream.Event(4, ts("2026-01-01 00:21:00"), 2, "view", 8.0)) // other user
    val purchases = Seq(
      EventStream.Event(10, ts("2026-01-01 00:25:00"), 1, "purchase", 99.0),
      EventStream.Event(11, ts("2026-01-01 02:00:00"), 1, "purchase", 50.0))

    val lStream = MemoryStream[EventStream.Event]
    val rStream = MemoryStream[EventStream.Event]
    val q = EventStream.intervalJoin(lStream.toDF(), rStream.toDF())
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      lStream.addData(views: _*)
      rStream.addData(purchases: _*)
      q.processAllAvailable()
      // advance both watermarks so all joinable pairs are emitted
      lStream.addData(EventStream.Event(90, ts("2026-01-01 09:00:00"), 9, "view", 0.0))
      rStream.addData(EventStream.Event(91, ts("2026-01-01 09:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ij")
        .filter(col("r_id") < 90)
        .collect().map(r => (r.getAs[Long]("r_id"), r.getAs[Long]("l_user"),
          r.getAs[Double]("l_value"))).toSet
      val batch = EventStream.intervalJoin(views.toDF(), purchases.toDF())
        .collect().map(r => (r.getAs[Long]("r_id"), r.getAs[Long]("l_user"),
          r.getAs[Double]("l_value"))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // purchase 10 at 00:25 sees views at 00:05 and 00:20 (user 1 only);
      // purchase 11 at 02:00 sees nothing within 30 minutes
      assert(batch == Set((10L, 1L, 1.0), (10L, 1L, 2.0)))
    } finally q.stop()
  }

  test("LEFT OUTER interval join emits matchless purchases after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      EventStream.Event(1, ts("2026-01-01 00:05:00"), 1, "view", 1.0),
      EventStream.Event(2, ts("2026-01-01 00:20:00"), 1, "view", 2.0))
    val purchases = Seq(
      EventStream.Event(10, ts("2026-01-01 00:25:00"), 1, "purchase", 99.0),
      EventStream.Event(11, ts("2026-01-01 02:00:00"), 1, "purchase", 50.0), // no prior in 30 min
      EventStream.Event(12, ts("2026-01-01 00:30:00"), 3, "purchase", 7.0))  // user with no views

    val lStream = MemoryStream[EventStream.Event]
    val rStream = MemoryStream[EventStream.Event]
    val q = EventStream.intervalJoinOuter(lStream.toDF(), rStream.toDF())
      .writeStream.format("memory").queryName("ijo")
      .outputMode("append").start()
    try {
      lStream.addData(views: _*)
      rStream.addData(purchases: _*)
      q.processAllAvailable()
      // outer results are final only once BOTH watermarks pass: push them
      lStream.addData(EventStream.Event(90, ts("2026-01-01 09:00:00"), 9, "view", 0.0))
      rStream.addData(EventStream.Event(91, ts("2026-01-01 09:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
      lStream.addData(EventStream.Event(92, ts("2026-01-01 12:00:00"), 9, "view", 0.0))
      rStream.addData(EventStream.Event(93, ts("2026-01-01 12:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
      def norm(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("r_id"),
          Option(r.getAs[Any]("l_value")).map(_.asInstanceOf[Double]))
      val streamed = spark.table("ijo")
        .filter(col("r_id") < 90).collect().map(norm).toSet
      val batch = EventStream.intervalJoinOuter(views.toDF(), purchases.toDF())
        .collect().map(norm).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the matchless purchases ARE present, with null left side
      assert(batch.contains((11L, None)) && batch.contains((12L, None)))
      assert(batch.contains((10L, Some(1.0))) && batch.contains((10L, Some(2.0))))
    } finally q.stop()
  }

  test("sessionization closes sessions after the gap via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      stream.addData(
        EventStream.Event(1, ts("2026-01-01 00:00:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2026-01-01 00:10:00"), 1, "click", 2.0),
        // same user, 3h later → new session; the first must close
        EventStream.Event(3, ts("2026-01-01 03:00:00"), 1, "click", 4.0))
      q.processAllAvailable()
      // push the watermark forward so the timeout fires for session 2
      stream.addData(EventStream.Event(9, ts("2026-01-01 09:00:00"), 2, "x", 0.0))
      q.processAllAvailable()
      stream.addData(EventStream.Event(10, ts("2026-01-01 23:00:00"), 3, "x", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter(col("user_id") === 1).orderBy("start").collect()
      assert(sessions.length == 2)
      assert(sessions(0).getAs[Timestamp]("start") == ts("2026-01-01 00:00:00"))
      assert(sessions(0).getAs[Timestamp]("end") == ts("2026-01-01 00:10:00"))
      assert(sessions(0).getAs[Long]("n_events") == 2)
      assert(sessions(0).getAs[Double]("total_value") == 3.0)
      assert(sessions(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("late events extend a session's start; far stragglers get their own") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      stream.addData(EventStream.Event(1, ts("2026-01-01 10:00:00"), 1, "c", 1.0))
      q.processAllAvailable()
      stream.addData(
        // 10 min late but within the session gap: must merge AND pull the
        // session start back (the old code kept start=10:00)
        EventStream.Event(2, ts("2026-01-01 09:50:00"), 1, "c", 2.0),
        // 90 min older than the session start (past the gap, inside the
        // 2h watermark): its own single-event session, NOT merged into
        // the 10:00 session the way `t - end <= gap` alone would
        EventStream.Event(3, ts("2026-01-01 08:30:00"), 1, "c", 4.0))
      q.processAllAvailable()
      // close everything via the event-time timeout
      stream.addData(EventStream.Event(9, ts("2026-01-01 23:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("late_sessions")
        .filter(col("user_id") === 1).orderBy("start").collect()
      assert(sessions.length == 2, sessions.mkString(","))
      assert(sessions(0).getAs[Timestamp]("start") == ts("2026-01-01 08:30:00"))
      assert(sessions(0).getAs[Long]("n_events") == 1)
      assert(sessions(1).getAs[Timestamp]("start") == ts("2026-01-01 09:50:00"))
      assert(sessions(1).getAs[Timestamp]("end") == ts("2026-01-01 10:00:00"))
      assert(sessions(1).getAs[Long]("n_events") == 2)
      assert(sessions(1).getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStream.Event]
    val q = EventStream.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData(
        EventStream.Event(1, ts("2026-01-01 00:00:00"), 1, "click", 1.0),
        EventStream.Event(1, ts("2026-01-01 00:00:01"), 1, "click", 1.0), // dup id
        EventStream.Event(2, ts("2026-01-01 00:00:02"), 1, "click", 2.0))
      q.processAllAvailable()
      stream.addData( // replayed dup in a later batch, still in watermark
        EventStream.Event(1, ts("2026-01-01 00:10:00"), 1, "click", 1.0),
        EventStream.Event(3, ts("2026-01-01 00:10:01"), 2, "view", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("windowed agg runs identically over the batch events table") {
    val out = EventStream.windowedAgg(Tables.load(spark, sf0001, "events"))
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("window_start", "event_type", "n_events", "sum_value"))
  }
}
