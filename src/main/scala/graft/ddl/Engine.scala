package graft.ddl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** DDL / DML surface over the Spark session catalog — the counterpart of
  * the reference's executor_ddl.go:1-120 (CREATE SCHEMA/TABLE) and
  * builder_dml.go:14-469 (INSERT VALUES, COPY FROM/TO).
  *
  * Constraints (PRIMARY KEY / NOT NULL) are recorded as table properties:
  * declarative only — Spark does not enforce them at write (the reference
  * enforces PK via an ART index, storage/index.go:19-28; on Spark that
  * enforcement belongs to the writer pipeline, e.g. a pre-insert
  * dedup-by-key job, not the catalog).
  */
object Engine {

  def createSchema(spark: SparkSession, name: String,
      location: Option[String] = None): Unit = {
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name$loc")
  }

  def dropSchema(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $name CASCADE")

  /** CREATE TABLE with schema + declarative constraints-as-properties. */
  def createTable(spark: SparkSession, table: String, schema: StructType,
      primaryKey: Seq[String] = Nil, location: Option[String] = None): Unit = {
    val cols = schema.fields.map { f =>
      val notNull = if (!f.nullable) " NOT NULL" else ""
      s"${f.name} ${f.dataType.sql}$notNull"
    }.mkString(", ")
    val props =
      if (primaryKey.nonEmpty)
        s" TBLPROPERTIES ('graft.primaryKey' = '${primaryKey.mkString(",")}')"
      else ""
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table ($cols) USING parquet$loc$props")
  }

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** INSERT ... VALUES via a LocalRelation write (executor_insert.go). */
  def insertInto(spark: SparkSession, table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).insertInto(table)

  /** COPY FROM file into a catalog table (executor_scan.go:272-460 parquet/
    * csv import paths). */
  def copyFrom(spark: SparkSession, table: String, path: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Long = {
    val src = spark.read.options(options).format(format).load(path)
    // align by the table's column order, cast to its types
    val target = spark.table(table)
    val aligned = src.select(target.schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)): _*)
    aligned.write.mode(SaveMode.Append).insertInto(table)
    src.count()
  }

  /** ANALYZE: compute table + column statistics so Catalyst's CBO
    * (join reorder, build-side choice) has real cardinalities — the Spark
    * counterpart of the reference's stats-driven join order
    * (optimizer_joinorder.go TDoms from storage/stats.go distinct counts).
    * Pair with spark.sql.cbo.enabled=true / joinReorder.enabled=true. */
  def analyze(spark: SparkSession, table: String): Unit =
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")

  /** COPY TO: export a query result (builder_dml.go:470+). */
  def copyTo(df: DataFrame, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit =
    df.write.options(options).format(format).mode(SaveMode.Overwrite).save(path)
}
