package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access.
  *
  * The driver parquet (TESTDATA.md) stores TPC-H-ish tables one file per
  * table; `orders.o_orderdate` / `lineitem.l_shipdate` are physically
  * timestamp[ms] (FIXTURES.md §B) and are cast to DateType here so date
  * arithmetic matches the reference semantics (reference DDL declares DATE,
  * /root/reference/cases/tpch/query/ddl.sql).
  *
  * At 100 TB these reads would be directory-partitioned parquet; everything
  * downstream only assumes a DataFrame with this schema, so swapping the
  * loader for a catalog table / DSv2 source is a one-line change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val dateCols: Map[String, Seq[String]] = Map(
    "orders"   -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  /** Load one table with date normalization applied. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    dateCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, to_date(col(c))) else d
    }
  }

  /** Register all tables of a scale-factor dir as temp views (idempotent). */
  def register(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }
}
