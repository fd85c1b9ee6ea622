package graft.ddl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raised when an insert violates a declared constraint (reference:
  * storage/table.go:282+ PK/NOT NULL verification via the ART index). */
final class ConstraintViolationException(msg: String)
  extends RuntimeException(msg)

/** DDL / DML surface over the Spark session catalog — the counterpart of
  * the reference's executor_ddl.go:1-120 (CREATE SCHEMA/TABLE) and
  * builder_dml.go:14-469 (INSERT VALUES, COPY FROM/TO).
  *
  * Constraints (PRIMARY KEY / NOT NULL) are recorded as table properties
  * and ENFORCED at insert time by [[Engine.insertInto]]: NOT NULL is one
  * aggregate over the batch; PK uniqueness is a batch-internal group-count
  * plus a semi-join against the table (the reference does the same checks
  * against its ART index, storage/table.go:282+ — on Spark the "index" is
  * the table itself, and the join broadcasts whichever side is small).
  */
object Engine {

  def createSchema(spark: SparkSession, name: String,
      location: Option[String] = None): Unit = {
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name$loc")
  }

  def dropSchema(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $name CASCADE")

  /** CREATE TABLE with schema + declarative constraints-as-properties.
    * NOT NULL columns are recorded as a property alongside the primary
    * key: Spark's file-source catalog reports EVERY column of a `USING
    * parquet` table as nullable, so the declared schema cannot carry the
    * constraint — the property is the only durable record insertInto can
    * enforce against. */
  def createTable(spark: SparkSession, table: String, schema: StructType,
      primaryKey: Seq[String] = Nil, location: Option[String] = None): Unit = {
    val cols = schema.fields.map { f =>
      val notNull = if (!f.nullable) " NOT NULL" else ""
      s"${f.name} ${f.dataType.sql}$notNull"
    }.mkString(", ")
    val notNulls = schema.fields.filterNot(_.nullable).map(_.name)
    val propKvs =
      (if (primaryKey.nonEmpty)
        Seq(s"'graft.primaryKey' = '${primaryKey.mkString(",")}'") else Nil) ++
      (if (notNulls.nonEmpty)
        Seq(s"'graft.notNull' = '${notNulls.mkString(",")}'") else Nil)
    val props =
      if (propKvs.nonEmpty) s" TBLPROPERTIES (${propKvs.mkString(", ")})"
      else ""
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table ($cols) USING parquet$loc$props")
  }

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  private def propListOf(spark: SparkSession, table: String,
      key: String): Seq[String] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
  }

  /** Declared primary key of a table, from its properties. */
  def primaryKeyOf(spark: SparkSession, table: String): Seq[String] =
    propListOf(spark, table, "graft.primaryKey")

  /** Declared NOT NULL columns, from the property createTable records
    * (the catalog schema itself always reports nullable for parquet). */
  def notNullOf(spark: SparkSession, table: String): Seq[String] =
    propListOf(spark, table, "graft.notNull")

  /** INSERT ... VALUES via a LocalRelation write (executor_insert.go),
    * verifying declared constraints first (executor_insert.go:1-120 →
    * storage/table.go:282+): NOT NULL columns reject null batch values;
    * the primary key must be unique within the batch AND absent from the
    * table. Set `enforceConstraints=false` to bulk-load unchecked.
    *
    * The batch is pinned (localCheckpoint) before validation so the rows
    * checked ARE the rows written — a non-deterministic source re-evaluated
    * between check and write could otherwise pass validation yet write
    * violating rows. Enforcement assumes a single writer per table, like
    * the reference's engine (one process owns storage-v1): two concurrent
    * inserts of the same key can both pass the existence probe; there is
    * no table-level lock to serialize them.  */
  def insertInto(spark: SparkSession, table: String, df: DataFrame,
      enforceConstraints: Boolean = true): Long = {
    val target = spark.table(table)
    // Align to the table schema BY NAME before anything else:
    // `write.insertInto` is positional, so a reordered batch would pass
    // name-based validation yet write columns into the wrong slots — the
    // checked data must BE the written data. A missing column fails here
    // with a clear message instead of silently shifting values.
    target.schema.fieldNames.foreach(c =>
      require(df.columns.contains(c),
        s"insert into $table: batch is missing column $c"))
    val alignedDf = df.select(target.schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)): _*)
    if (!enforceConstraints) {
      alignedDf.write.mode(SaveMode.Append).insertInto(table)
      return -1L
    }
    import org.apache.spark.sql.functions._
    // eager=true materializes now: check-then-act sees one snapshot
    val batch = alignedDf.localCheckpoint(true)
    try {
      // NOT NULL from the recorded property — the parquet catalog schema
      // reports every column nullable, so it can't carry the constraint
      val required = notNullOf(spark, table).filter(batch.columns.contains)
      val counts = batch.agg(
        count(lit(1)).as("_n"),
        required.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c")): _*)
        .collect().head
      required.foreach { c =>
        val n = counts.getAs[Long](s"_null_$c")
        if (n > 0) throw new ConstraintViolationException(
          s"NOT NULL violation: column $c has $n null value(s)")
      }
      val pk = primaryKeyOf(spark, table)
      if (pk.nonEmpty) {
        // PK implies NOT NULL: a null key never matches the semi-join
        // probe (NULL = NULL is not true), so repeated null-PK inserts
        // would all "pass" uniqueness — reject them outright
        val nullKey = batch
          .filter(pk.map(col(_).isNull).reduce(_ || _)).limit(1)
        if (!nullKey.isEmpty) throw new ConstraintViolationException(
          s"PRIMARY KEY violation: null key value on $pk")
        val dupIn = batch.groupBy(pk.map(col): _*)
          .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1)
        if (!dupIn.isEmpty) throw new ConstraintViolationException(
          s"PRIMARY KEY violation: duplicate key within the batch on $pk")
        val existing = batch.select(pk.map(col): _*)
          .join(target.select(pk.map(col): _*), pk, "left_semi").limit(1)
        if (!existing.isEmpty) throw new ConstraintViolationException(
          s"PRIMARY KEY violation: key already present in $table on $pk")
      }
      batch.write.mode(SaveMode.Append).insertInto(table)
      counts.getAs[Long]("_n")
    } finally graft.Materialize.unpin(batch)
  }

  /** COPY FROM file into a catalog table (executor_scan.go:272-460 parquet/
    * csv import paths). */
  def copyFrom(spark: SparkSession, table: String, path: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Long = {
    val src = spark.read.options(options).format(format).load(path)
    // imports go through the same constraint-checked insert path, which
    // aligns/casts by name and returns the count of the PINNED batch —
    // no second scan of the source file, and the count is of the rows
    // actually written, not a re-read that could see a changed file
    insertInto(spark, table, src)
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
