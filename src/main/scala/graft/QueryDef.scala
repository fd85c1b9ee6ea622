package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable key; shows up in CORRECTNESS_r{N}.json
  * @param run    Spark-side implementation ((session, sfDir) => result)
  * @param oracle equivalent DuckDB SQL over the same parquet tables, or None
  *               for capabilities not expressible in portable SQL (driver
  *               then records a weaker rows-only check; those get dedicated
  *               ScalaTest oracles instead)
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Query with a DuckDB oracle. */
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Query checked rows-only by the driver (ScalaTest covers semantics). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** ANSI-SQL query whose text runs verbatim on BOTH engines: Spark executes
    * it over the registered temp views (exercising Catalyst's parser, subquery
    * decorrelation, CTE inlining), DuckDB replays it as the oracle. */
  def sql(name: String, sharedSql: String): Q =
    Q(name, (s, dir) => { Tables.register(s, dir); s.sql(sharedSql) },
      Some(sharedSql))
}
