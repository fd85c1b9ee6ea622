package graft.operators

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val loc = Files.createTempDirectory("bucketing-").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketing.writeBucketed(Tables.load(spark, sf0001, "orders"),
        "b_orders", "o_orderkey", 8, s"$loc/orders")
      Bucketing.writeBucketed(
        Tables.load(spark, sf0001, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8, s"$loc/lineitem")
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it is still correct
      val expected = Tables.load(spark, sf0001, "lineitem")
        .join(Tables.load(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("directory partitioning prunes partitions before file IO") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val loc = Files.createTempDirectory("partitioning-").toString
    Bucketing.writePartitioned(
      Tables.load(spark, sf0001, "orders")
        .withColumn("o_year", year(col("o_orderdate"))),
      s"$loc/orders_by_year", "o_year")
    val df = spark.read.parquet(s"$loc/orders_by_year")
      .filter(col("o_year") === 1997)
    val scan = df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }.head
    // the year predicate is a partition filter, not a data filter
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("o_year")),
      scan.partitionFilters.mkString(", "))
    val expected = Tables.load(spark, sf0001, "orders")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(df.count() == expected && expected > 0)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val loc = Files.createTempDirectory("bucketing-agg-").toString
    try {
      Bucketing.writeBucketed(Tables.load(spark, sf0001, "lineitem"),
        "b_li_agg", "l_orderkey", 8, s"$loc/li")
      val agg = spark.table("b_li_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy should not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_li_agg")
    }
  }
}
