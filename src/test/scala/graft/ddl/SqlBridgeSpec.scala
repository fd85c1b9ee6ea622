package graft.ddl

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** The reference's ddl.sql, byte-for-byte, through the dialect bridge —
  * plus pg-COPY round-trips over the TPC-H `.tbl`-style pipe CSV. */
class SqlBridgeSpec extends SparkTestBase {

  private val ddlPath = "/root/reference/cases/tpch/query/ddl.sql"

  private def inScratchDb[A](name: String)(f: => A): A = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")
    val prev = spark.catalog.currentDatabase
    spark.catalog.setCurrentDatabase(name)
    try f finally {
      spark.catalog.setCurrentDatabase(prev)
      spark.sql(s"DROP DATABASE IF EXISTS $name CASCADE")
    }
  }

  test("the reference's ddl.sql runs byte-for-byte through the bridge") {
    inScratchDb("ref_ddl") {
      val stmts = new String(Files.readAllBytes(Paths.get(ddlPath)), "UTF-8")
        .split(";").map(_.trim).filter(_.nonEmpty)
      stmts.foreach(SqlBridge.execute(spark, _))
      val tables = spark.catalog.listTables("ref_ddl")
        .collect().map(_.name.toLowerCase).toSet
      assert(Set("nation", "region", "part", "supplier", "partsupp",
        "customer", "orders", "lineitem").subsetOf(tables))
      // inline constraints landed as enforceable properties
      assert(Engine.primaryKeyOf(spark, "nation") == Seq("n_nationkey"))
      assert(Engine.primaryKeyOf(spark, "partsupp") ==
        Seq("ps_partkey", "ps_suppkey"))
      assert(Engine.notNullOf(spark, "region").contains("r_name"))
      // declared types survived Spark's own DDL type parser
      val part = spark.table("part").schema
      assert(part("p_retailprice").dataType.sql == "DECIMAL(15,2)")
    }
  }

  test("pg COPY FROM pipe-delimited csv loads and enforces the PK") {
    inScratchDb("ref_copy") {
      SqlBridge.execute(spark,
        """CREATE TABLE NATION  ( N_NATIONKEY  INTEGER NOT NULL,
          |  N_NAME VARCHAR(25) NOT NULL,
          |  N_REGIONKEY INTEGER NOT NULL,
          |  N_COMMENT VARCHAR(152),
          |  PRIMARY KEY (N_NATIONKEY))""".stripMargin)
      val tbl = Files.createTempFile("nation-", ".tbl")
      Files.writeString(tbl,
        "0|ALGERIA|0|ok\n1|ARGENTINA|1|fine\n2|BRAZIL|1|\n")
      val res = SqlBridge.execute(spark,
        s"COPY nation FROM '$tbl' (FORMAT csv, DELIMITER '|')")
      assert(res.collect().head.getLong(0) == 3L)
      assert(spark.table("nation").count() == 3)
      // re-copying the same keys violates the enforced PRIMARY KEY
      intercept[ConstraintViolationException] {
        SqlBridge.execute(spark,
          s"COPY nation FROM '$tbl' (FORMAT csv, DELIMITER '|')")
      }
      // COPY (query) TO parquet round-trips
      val out = Files.createTempDirectory("copyto-").toString + "/nation_out"
      SqlBridge.execute(spark,
        s"COPY (SELECT n_nationkey, n_name FROM nation) TO '$out' " +
          "(FORMAT parquet)")
      assert(spark.read.parquet(out).count() == 3)
    }
  }

  test("plain SQL passes through untouched") {
    val df = SqlBridge.execute(spark, "SELECT 1 + 1 AS two")
    assert(df.collect().head.getInt(0) == 2)
  }
}
