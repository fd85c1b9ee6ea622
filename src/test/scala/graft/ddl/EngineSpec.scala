package graft.ddl

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class EngineSpec extends SparkTestBase {

  test("insert-time constraint enforcement: PK uniqueness and NOT NULL") {
    val loc = Files.createTempDirectory("engine-pk-").toString
    val db = "engine_pk_db"
    try {
      Engine.createSchema(spark, db, Some(s"$loc/db"))
      Engine.createTable(spark, s"$db.t",
        StructType(Seq(
          StructField("k", LongType, nullable = false),
          StructField("v", StringType))),
        primaryKey = Seq("k"))
      val sch = spark.table(s"$db.t").schema
      Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
        java.util.List.of(Row(1L, "one")), sch))
      // duplicate within the batch
      intercept[ConstraintViolationException](
        Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
          java.util.List.of(Row(5L, "x"), Row(5L, "y")), sch)))
      // key already present in the table
      intercept[ConstraintViolationException](
        Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
          java.util.List.of(Row(1L, "again")), sch)))
      // NOT NULL violation: enforced from the graft.notNull property —
      // the parquet catalog schema reports every column nullable, so the
      // declared schema alone could never carry this (a null key also
      // trips the PK null-key rejection; both are violations)
      val nullableSch = StructType(Seq(
        StructField("k", LongType, nullable = true),
        StructField("v", StringType)))
      intercept[ConstraintViolationException](
        Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
          java.util.List.of(Row(null, "nope")), nullableSch)))
      // column order must not matter: validated-by-name == written-by-name
      val reordered = spark.createDataFrame(
        java.util.List.of(Row("seven", Long.box(7L))),
        StructType(Seq(StructField("v", StringType),
          StructField("k", LongType))))
      Engine.insertInto(spark, s"$db.t", reordered)
      assert(spark.table(s"$db.t").filter(col("k") === 7L)
        .head().getString(1) == "seven")
      // a batch missing a table column fails clearly, never writes shifted
      intercept[IllegalArgumentException](
        Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
          java.util.List.of(Row(Long.box(8L))),
          StructType(Seq(StructField("k", LongType))))))
      // clean insert still works; unchecked bulk load available
      Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
        java.util.List.of(Row(2L, "two")), sch))
      assert(spark.table(s"$db.t").count() == 3) // {1, 7, 2}
      Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
        java.util.List.of(Row(1L, "dup-ok")), sch),
        enforceConstraints = false)
      assert(spark.table(s"$db.t").count() == 4)
    } finally Engine.dropSchema(spark, db)
  }

  test("create schema/table, insert values, copy from/to, constraints recorded") {
    val loc = Files.createTempDirectory("engine-spec-").toString
    val db = "engine_spec_db"
    try {
      Engine.createSchema(spark, db, Some(s"$loc/db"))
      Engine.createTable(spark, s"$db.t",
        StructType(Seq(
          StructField("k", LongType, nullable = false),
          StructField("v", StringType))),
        primaryKey = Seq("k"))
      // PK recorded as a table property (declarative, like the reference DDL)
      val props = spark.sql(s"SHOW TBLPROPERTIES $db.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.primaryKey").contains("k"))

      Engine.insertInto(spark, s"$db.t", spark.createDataFrame(
        java.util.List.of(Row(1L, "one"), Row(2L, "two")),
        spark.table(s"$db.t").schema))
      assert(spark.table(s"$db.t").count() == 2)

      // COPY FROM csv with coercion
      val csv = s"$loc/in.csv"
      Files.writeString(java.nio.file.Paths.get(csv), "k,v\n3,three\n4,four\n")
      val n = Engine.copyFrom(spark, s"$db.t", csv, "csv",
        Map("header" -> "true"))
      assert(n == 2)
      assert(spark.table(s"$db.t").count() == 4)

      // COPY TO + read back
      Engine.copyTo(spark.table(s"$db.t"), s"$loc/out", "parquet")
      assert(spark.read.parquet(s"$loc/out").count() == 4)
    } finally {
      Engine.dropSchema(spark, db)
    }
  }

  test("ANALYZE computes stats the CBO can use") {
    val loc = Files.createTempDirectory("engine-analyze-").toString
    val db = "engine_analyze_db"
    try {
      Engine.createSchema(spark, db, Some(s"$loc/db"))
      Engine.createTable(spark, s"$db.s",
        StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
      Engine.insertInto(spark, s"$db.s", spark.createDataFrame(
        java.util.List.of(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")),
        spark.table(s"$db.s").schema))
      Engine.analyze(spark, s"$db.s")
      val stats = spark.sql(s"DESCRIBE EXTENDED $db.s").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(stats.get("Statistics").exists(_.contains("3 rows")), stats)
    } finally {
      Engine.dropSchema(spark, db)
    }
  }
}
