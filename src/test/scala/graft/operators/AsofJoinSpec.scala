package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join semantics: backward/forward nearest match per key, inclusive
  * at equal timestamps, tolerance windows, and equivalence against a
  * brute-force range-join-then-pick-max oracle on generated data. */
class AsofJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private lazy val quotes: DataFrame = Seq(
    ("A", ts(100), 10.0),
    ("A", ts(200), 20.0),
    ("A", ts(300), 30.0),
    ("B", ts(150), 15.0)
  ).toDF("sym", "qts", "px")

  private lazy val trades: DataFrame = Seq(
    ("A", ts(50), 1L),   // before any quote → no match
    ("A", ts(200), 2L),  // equal ts → inclusive match at 200
    ("A", ts(250), 3L),  // between → 200
    ("A", ts(999), 4L),  // long after → 300 (unless tolerance)
    ("B", ts(160), 5L),
    ("C", ts(100), 6L)   // key with no quotes at all
  ).toDF("sym", "tts", "tid")

  private def matched(df: DataFrame): Map[Long, Option[Double]] =
    df.collect().map(r => r.getAs[Long]("tid") ->
      Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue)).toMap

  test("backward: latest quote at-or-before each trade") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("px"))
    assert(matched(out) == Map(
      1L -> None, 2L -> Some(20.0), 3L -> Some(20.0), 4L -> Some(30.0),
      5L -> Some(15.0), 6L -> None))
    // matched timestamp column rides along
    val m = out.filter($"tid" === 3).select("qts_matched").head().getTimestamp(0)
    assert(m == ts(200))
  }

  test("backward with tolerance nulls out stale matches") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("px"), toleranceSeconds = Some(100))
    assert(matched(out) == Map(
      1L -> None, 2L -> Some(20.0), 3L -> Some(20.0), 4L -> None,
      5L -> Some(15.0), 6L -> None))
  }

  test("forward: earliest quote at-or-after each trade") {
    val out = AsofJoin.forward(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("px"))
    assert(matched(out) == Map(
      1L -> Some(10.0), 2L -> Some(20.0), 3L -> Some(30.0), 4L -> None,
      5L -> None, 6L -> None))
  }

  test("left row count is preserved exactly (one output row per left row)") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
      Seq("px"))
    assert(out.count() == trades.count())
  }

  test("matches brute-force range-join oracle on generated data") {
    // deterministic generated corpus: 400 left / 600 right over 7 keys
    val left = spark.range(400).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(col("id") * 37 % 10007).as("lts"),
      col("id").as("lid"))
    val right = spark.range(600).select(
      (col("id") % 7).as("k"),
      timestamp_seconds(col("id") * 53 % 10007).as("rts"),
      (col("id") * 11 % 1000).cast("double").as("pay"))
      .groupBy("k", "rts").agg(max("pay").as("pay")) // unique per (k, ts)

    val asof = AsofJoin.backward(left, right, Seq("k"), "lts", "rts",
        Seq("pay"))
      .select("lid", "pay")

    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")
    val brute = spark.sql(
      """SELECT lid, pay FROM (
        |  SELECT l.lid, r.pay,
        |    row_number() OVER (PARTITION BY l.lid
        |                       ORDER BY r.rts DESC) AS rn
        |  FROM asof_l l JOIN asof_r r
        |    ON l.k = r.k AND r.rts <= l.lts) WHERE rn = 1
        |UNION ALL
        |SELECT l.lid, CAST(NULL AS DOUBLE) FROM asof_l l
        |WHERE NOT EXISTS (SELECT 1 FROM asof_r r
        |                  WHERE r.k = l.k AND r.rts <= l.lts)""".stripMargin)

    val a = asof.collect().map(r => (r.getLong(0),
      Option(r.getAs[java.lang.Double]("pay")))).toMap
    val b = brute.collect().map(r => (r.getLong(0),
      Option(r.getAs[java.lang.Double]("pay")))).toMap
    assert(a == b)
    assert(a.size == 400)
  }

  test("plan is one shuffle + window, not a theta join") {
    // distributed inputs (range), so EnsureRequirements actually plans the
    // exchange — the in-memory fixtures collapse to LocalTableScan with no
    // shuffle at all
    val left = spark.range(100).select((col("id") % 5).as("k"),
      timestamp_seconds(col("id")).as("lts"), col("id").as("lid"))
    val right = spark.range(100).select((col("id") % 5).as("k"),
      timestamp_seconds(col("id") * 2).as("rts"),
      col("id").cast("double").as("pay"))
    val out = AsofJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("pay"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesian")
      && !plan.contains("BroadcastNestedLoopJoin"))
    // the scale claim, pinned: both inputs shuffle ONCE on the key for the
    // union+window sweep — no join-side exchange, no candidate pairs
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 hash Exchange, plan:\n$plan")
  }
}
