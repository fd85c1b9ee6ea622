package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Coverage for the remaining SURVEY §2.2 expression rows: date ± interval
  * arithmetic, the CAST matrix, EXTRACT parts, nested IN-subqueries
  * (q20-shape), select-list correlated scalar subqueries, and a pure
  * range-condition join. */
object Extra {

  /** date ± INTERVAL arithmetic in pushable filter position (reference
    * common/date.go:28-45, q1/q4/q15/q20 canonical forms). The folded
    * literal keeps parquet pushdown intact. */
  val interval = Q.sql(
    "expr_date_interval",
    """SELECT count(*) AS n,
      |  min(CAST(l_shipdate AS DATE)) AS min_d,
      |  max(CAST(l_shipdate AS DATE)) AS max_d
      |FROM lineitem
      |WHERE l_shipdate <= DATE '2001-12-01' - INTERVAL 90 DAY
      |  AND l_shipdate >= DATE '1995-03-01' + INTERVAL 30 DAY""".stripMargin)

  /** CAST matrix: int↔string, double→floor→bigint, timestamp→date→string,
    * plus EXTRACT month/quarter (function_cast.go:54-105; double→int is
    * avoided in shared SQL because Spark truncates while DuckDB rounds —
    * floor() first makes both exact). */
  val casts = Q(
    "expr_cast_matrix",
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
      |  EXTRACT(month FROM o_orderdate) AS o_month,
      |  EXTRACT(quarter FROM o_orderdate) AS o_quarter
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_orderkey").cast("string").as("key_str"),
      floor(col("o_totalprice")).cast("long").as("price_floor"),
      col("o_orderdate").cast("date").cast("string").as("date_str"),
      month(col("o_orderdate")).as("o_month"),
      quarter(col("o_orderdate")).as("o_quarter"))
  }

  /** q20-shape: IN-subquery nested inside an IN-subquery with HAVING. */
  val nestedSemi = Q.sql(
    "q20_nested_semi",
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE 'big%')
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
      |ORDER BY s_suppkey""".stripMargin)

  /** Correlated scalar subquery in the SELECT list. */
  val selectScalar = Q.sql(
    "expr_select_scalar_subq",
    """SELECT r_regionkey, r_name,
      |  (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)
      |    AS n_nations
      |FROM region""".stripMargin)

  /** Pure range-condition join (no equi key): part sizes banded into
    * categories. The tiny ranges side is broadcast → a broadcast
    * nested-loop with a range predicate, the correct 100 TB plan
    * (reference theta-join residuals, executor_join.go:209-236). */
  val rangeJoin = Q(
    "rel_range_join",
    """SELECT cat, count(*) AS n_parts
      |FROM part JOIN (VALUES ('small', 1, 17), ('mid', 17, 34),
      |                       ('big', 34, 51)) AS c(cat, lo, hi)
      |  ON p_size >= lo AND p_size < hi
      |GROUP BY cat""".stripMargin) { (s, dir) =>
    import s.implicits._
    val cats = Seq(("small", 1, 17), ("mid", 17, 34), ("big", 34, 51))
      .toDF("cat", "lo", "hi")
    Tables.load(s, dir, "part")
      .join(broadcast(cats), col("p_size") >= col("lo") && col("p_size") < col("hi"))
      .groupBy("cat").agg(count(lit(1)).as("n_parts"))
  }

  /** CUBE + GROUPING() disambiguation of subtotal rows. */
  val cube = Q.sql(
    "rel_cube_grouping",
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
      |  sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)

  /** Batch sessionization with lag + running-sum window functions — the
    * batch twin of streaming.EventStream.sessionize (30-minute gap). */
  val sessions = Q.sql(
    "ev_sessions_batch",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  round(sum(value), 4) AS total_value
      |FROM sess GROUP BY user_id, session_id""".stripMargin)

  /** Statistical aggregates beyond sum/avg: median, stddev, correlation. */
  val statsAgg = Q.sql(
    "agg_stats",
    """SELECT l_returnflag,
      |  round(median(l_quantity), 4) AS med_qty,
      |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
      |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin)

  /** Window frames: sliding average, lead lookahead, ntile bucketing. */
  val windowFrames = Q.sql(
    "rel_window_frames",
    """SELECT o_custkey, o_orderkey,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
      |  lead(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS next_price,
      |  ntile(4) OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice, o_orderkey) AS quartile
      |FROM orders""".stripMargin)

  /** Higher-order array functions over the embedding column (lambda
    * aggregate/filter — the array-processing surface the pipeline ops are
    * built from). Sums accumulate in DOUBLE sequentially on both engines. */
  val arrayHof = Q(
    "expr_array_hof",
    """SELECT vec_id,
      |  round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_comp,
      |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
      |  round(list_max(embedding), 6) AS max_comp
      |FROM embeddings""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "embeddings").select(
      col("vec_id"),
      round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x), 4).as("sum_comp"),
      size(filter(col("embedding"), x => x > 0)).as("n_pos"),
      round(array_max(col("embedding")).cast("double"), 6).as("max_comp"))
  }

  def all: Seq[Q] = Seq(interval, casts, nestedSemi, selectScalar, rangeJoin,
    cube, sessions, statsAgg, windowFrames, arrayHof)
}
