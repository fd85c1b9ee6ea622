package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q

/** EXECUTED TPC-DS slice with DuckDB oracles.
  *
  * `ref_tpcds_plan` proves all 99 reference query files plan end-to-end;
  * this module goes further than the reference can (its engine lacks
  * window functions, set ops, ROLLUP — README feature table) by RUNNING a
  * representative 13-query slice on deterministic generated data
  * ([[TpcdsGen]]) and oracle-checking every row against DuckDB:
  *
  *   - q3/q42/q55: star joins + agg over date/item predicates
  *   - q5: three-channel UNION ALL + ROLLUP over sales+returns
  *   - q6: correlated scalar subquery per category + uncorrelated scalar
  *   - q7: 5-way join over customer_demographics + promotion
  *   - q8: INTERSECT of zip lists + HAVING, substring join
  *   - q51: FULL OUTER JOIN of two cumulative-window CTEs
  *   - q53/q89: windowed average over group-by output + ratio filter
  *   - q79: per-ticket agg then customer join
  *   - q96: time_dim/household filter count
  *   - q98: window ratio (class-partitioned revenue share)
  *
  * Query texts are the reference's own files (cases/tpcds/query/queryN.sql)
  * with minimal documented patches, applied IDENTICALLY for Spark and
  * DuckDB so both engines run the same statement:
  *   - alias unnamed aggregate outputs (the driver compare matches by
  *     column name; cosmetic)
  *   - add tiebreak columns to two ORDER BY ... LIMIT queries whose sort
  *     keys don't determine the row set (q79, q89 — without this ANY
  *     engine pair can legitimately disagree below the limit line)
  *   - q5: cast(0 as decimal(7,2)) → cast(0 as bigint) (the slice's money
  *     columns are BIGINT cents; DECIMAL outputs are banned by the driver
  *     hasher — compare.py's dtype audit)
  */
object Tpcds {

  private def load(n: Int): String = {
    val raw = new String(Files.readAllBytes(
      Paths.get(s"${RefTpcds.QueryDir}/query$n.sql")), "UTF-8")
    raw.trim.stripSuffix(";")
  }

  /** The slice: query number → text patch. */
  private val patches: Map[Int, String => String] = Map(
    3 -> identity,
    5 -> (t => t.replace("cast(0 as decimal(7,2))", "cast(0 as bigint)")),
    6 -> identity,
    7 -> identity,
    8 -> (t => t.replaceFirst(
      """sum\(ss_net_profit\)""", "sum(ss_net_profit) AS net_profit")),
    42 -> (t => t.replaceFirst(
      """,sum\(ss_ext_sales_price\)""",
      ",sum(ss_ext_sales_price) AS sum_sales")),
    51 -> identity,
    53 -> identity,
    55 -> identity,
    79 -> (t => t
      .replaceFirst("""substr\(s_city,1,30\)""",
        "substr(s_city,1,30) AS s_city")
      .replace("order by c_last_name,c_first_name,substr(s_city,1,30), profit",
        "order by c_last_name,c_first_name,substr(s_city,1,30), profit, ss_ticket_number")),
    89 -> (t => t.replace(
      "order by sum_sales - avg_monthly_sales, s_store_name",
      "order by sum_sales - avg_monthly_sales, s_store_name, i_category, i_class, i_brand, d_moy")),
    96 -> (t => t.replaceFirst("""select\s+count\(\*\)""",
      "select count(*) AS cnt")),
    98 -> identity)

  /** Tables referenced by a query text (word-boundary match — `store`
    * doesn't fire inside `store_sales`). */
  private def usedTables(text: String): Seq[String] =
    TpcdsGen.rows.keys.toSeq.sorted
      .filter(t => s"\\b$t\\b".r.findFirstIn(text).isDefined)

  /** DuckDB oracle: generator prelude + the same query text; a query that
    * itself starts WITH merges its CTE list into the prelude's. */
  private def oracleFor(text: String): String = {
    val prelude = TpcdsGen.duckPrelude(usedTables(text))
    if (text.matches("(?is)^\\s*with\\b.*"))
      prelude.stripSuffix("\n") + ",\n" +
        text.replaceFirst("(?is)^\\s*with\\b", "")
    else prelude + text
  }

  private def q(n: Int): Q = {
    val text = patches(n)(load(n))
    Q(s"tpcds_q$n", oracleFor(text)) { (s, _) =>
      val isolated = s.newSession()
      TpcdsGen.register(isolated)
      isolated.sql(text)
    }
  }

  val all: Seq[Q] = patches.keys.toSeq.sorted.map(q)
}
