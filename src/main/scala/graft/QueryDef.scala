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
}
