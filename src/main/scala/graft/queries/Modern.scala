package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SQL surface the reference declares or implies but never wires (nested
  * types exist only in its type enum, common/type_id.go:8-49; no recursion,
  * no lateral, no JSON functions anywhere in pkg/compute) — all of it free
  * and oracle-checkable on Spark 4.x, so exposed here as first-class
  * entries. Every query is deterministic: ties broken by explicit keys,
  * money carried as BIGINT cents (compare.py DECIMAL audit).
  */
object Modern {

  /** WITH RECURSIVE (Spark 4.x UnionLoop): each nation key walks its
    * implicit binary-heap ancestor chain (parent(k) = floor((k-1)/2)) to
    * the root. Verbatim-shared text — Catalyst executes the same SQL
    * DuckDB replays, so anchor/step typing and the fixpoint semantics are
    * both pinned. Depth is bounded by log2(maxkey): the recursion state
    * stays O(rows), shuffle-free per step at any scale. */
  val recursiveCte = Q.sql(
    "rel_recursive_cte",
    """WITH RECURSIVE anc(node, anc_key, depth) AS (
      |  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
      |         CAST(0 AS BIGINT)
      |  FROM nation
      |  UNION ALL
      |  SELECT a.node, CAST(floor((a.anc_key - 1) / 2.0) AS BIGINT),
      |         a.depth + CAST(1 AS BIGINT)
      |  FROM anc a WHERE a.anc_key > 0)
      |SELECT node, count(*) AS n_ancestors, max(depth) AS root_depth
      |FROM anc GROUP BY node ORDER BY node""".stripMargin)

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    * suppliers per nation). Catalyst decorrelates this into a window
    * rank ≤ 2 over one shuffled pass — the scalable form of
    * "top-n per group" — rather than n_outer point lookups. */
  val lateralTopn = Q.sql(
    "rel_lateral_topn",
    """SELECT n_name, top.s_name, top.s_acctbal
      |FROM nation, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  WHERE s_nationkey = n_nationkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 2) AS top
      |ORDER BY n_name, top.s_acctbal DESC, top.s_name""".stripMargin)

  /** JSON path extraction round-trip: rows → JSON text → typed values.
    * Spark `get_json_object` (codegen'd path evaluator) vs DuckDB
    * json_extract; both stay inside whole-stage codegen, no UDFs. */
  val jsonFuncs = Q(
    "expr_json_funcs",
    """SELECT o_orderkey,
      |  CAST(json_extract(j, '$.k') AS BIGINT) AS k_back,
      |  json_extract_string(j, '$.s') AS s_back,
      |  CAST(json_array_length(json_extract(j, '$.a')) AS BIGINT) AS arr_len
      |FROM (SELECT o_orderkey,
      |        concat('{"k":', o_orderkey, ',"s":"', o_orderstatus,
      |               '","a":[1,2,3]}') AS j
      |      FROM orders)
      |WHERE o_orderkey % 1000 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.register(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  CAST(get_json_object(j, '$.k') AS BIGINT) AS k_back,
        |  get_json_object(j, '$.s') AS s_back,
        |  CAST(json_array_length(get_json_object(j, '$.a')) AS BIGINT)
        |    AS arr_len
        |FROM (SELECT o_orderkey,
        |        concat('{"k":', o_orderkey, ',"s":"', o_orderstatus,
        |               '","a":[1,2,3]}') AS j
        |      FROM orders)
        |WHERE o_orderkey % 1000 = 0
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Spark 4 VARIANT: parse once, extract typed fields with path + target
    * type. The binary variant encoding is the 100 TB shape for
    * semi-structured columns (parse at ingest, shred at read) — DuckDB
    * replays the same semantics through its JSON type. */
  val variantFuncs = Q(
    "expr_variant",
    """SELECT o_orderkey,
      |  CAST(json_extract(j, '$.k') AS BIGINT) AS k_back,
      |  CAST(json_extract(j, '$.p') AS BIGINT) AS price_cents
      |FROM (SELECT o_orderkey,
      |        concat('{"k":', o_orderkey, ',"p":',
      |               CAST(round(o_totalprice * 100) AS BIGINT), '}') AS j
      |      FROM orders)
      |WHERE o_orderkey % 1000 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.register(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  variant_get(v, '$.k', 'bigint') AS k_back,
        |  variant_get(v, '$.p', 'bigint') AS price_cents
        |FROM (SELECT o_orderkey,
        |        parse_json(concat('{"k":', o_orderkey, ',"p":',
        |          CAST(round(o_totalprice * 100) AS BIGINT), '}')) AS v
        |      FROM orders)
        |WHERE o_orderkey % 1000 = 0
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Nested types as working values, not just declared enum entries:
    * per-nation sorted ARRAY of supplier balances (cents), reduced with
    * array kernels (size / element_at / higher-order aggregate). The
    * oracle states the same facts relationally — the check is that the
    * array pipeline loses nothing. collect_list is bounded per group
    * (suppliers per nation), never corpus-sized. */
  val nestedAgg = Q(
    "rel_nested_agg",
    """SELECT s_nationkey AS nationkey, count(*) AS n_supps,
      |  min(CAST(round(s_acctbal * 100) AS BIGINT)) AS min_cents,
      |  max(CAST(round(s_acctbal * 100) AS BIGINT)) AS max_cents,
      |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents
      |FROM supplier GROUP BY s_nationkey ORDER BY nationkey""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "supplier")
        .select(col("s_nationkey"),
          round(col("s_acctbal") * 100).cast("long").as("cents"))
        .groupBy("s_nationkey")
        .agg(sort_array(collect_list("cents")).as("arr"))
        .select(
          col("s_nationkey").as("nationkey"),
          size(col("arr")).cast("long").as("n_supps"),
          element_at(col("arr"), 1).as("min_cents"),
          element_at(col("arr"), -1).as("max_cents"),
          aggregate(col("arr"), lit(0L), (acc, x) => acc + x)
            .as("sum_cents"))
        .orderBy("nationkey")
  }

  /** SQL-defined scalar function (CREATE FUNCTION … RETURN expr) through
    * the engine's SQL door — the body inlines into the calling plan, so
    * it codegens like any expression (no black-box UDF). Oracle replays
    * the inlined body. */
  val sqlUdf = Q(
    "ddl_udf",
    """SELECT o_orderstatus,
      |  CAST(sum(CAST(round(o_totalprice * (1 - 0.04) * 100) AS BIGINT))
      |    AS BIGINT) AS net_cents
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.register(s, dir)
    graft.ddl.SqlBridge.execute(s,
      """CREATE OR REPLACE TEMPORARY FUNCTION net_cents(p DOUBLE, d DOUBLE)
        |RETURNS BIGINT RETURN CAST(round(p * (1 - d) * 100) AS BIGINT)"""
        .stripMargin)
    graft.ddl.SqlBridge.execute(s,
      """SELECT o_orderstatus, sum(net_cents(o_totalprice, 0.04)) AS net_cents
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** GROUP BY ALL / ORDER BY ALL — the modern analyst shorthand, identical
    * semantics on both engines (grouping keys inferred from the
    * non-aggregate select items). */
  val groupByAll = Q.sql(
    "rel_group_by_all",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)

  /** Named WINDOW clause shared by several functions over one spec —
    * one shuffle+sort feeds both, which is the point at scale. */
  val namedWindow = Q.sql(
    "rel_named_window",
    """SELECT o_orderkey, o_custkey,
      |  rank() OVER w AS rnk, count(*) OVER w AS so_far
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin)

  val all: Seq[Q] = Seq(recursiveCte, lateralTopn, jsonFuncs, variantFuncs,
    nestedAgg, sqlUdf, groupByAll, namedWindow)
}
