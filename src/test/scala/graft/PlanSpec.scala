package graft

import graft.queries.Tpch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan goldens: regressions that silently kill 100 TB scalability must fail
  * fast. Round-1 verdict: date filters were computed on a derived `to_date`
  * column → zero parquet pushdown; customer/supplier carried forced
  * broadcast hints → OOM at scale. These tests pin the fixed behavior. */
class PlanSpec extends SparkTestBase {

  /** All (path, pushedFilters-string) of parquet scans in the plan. */
  private def scans(df: DataFrame): Seq[(String, String)] =
    df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: FileSourceScanExec =>
        val path = s.relation.location.rootPaths.mkString(",")
        (path, s.metadata.getOrElse("PushedFilters", ""))
    }

  private def pushedFor(df: DataFrame, table: String): String =
    scans(df).collect { case (p, f) if p.contains(table) => f }.mkString("; ")

  test("q6 date-range filter reaches the parquet scan (PushedFilters)") {
    val f = pushedFor(Tpch.q6.run(spark, sf0001), "lineitem")
    assert(f.contains("GreaterThanOrEqual(l_shipdate"), f)
    assert(f.contains("LessThan(l_shipdate"), f)
    assert(f.contains("LessThan(l_quantity"), f)
  }

  test("function-matrix key filters reach the parquet scan") {
    import graft.queries.Rel
    assert(pushedFor(Rel.mathFuncs.run(spark, sf0001), "lineitem")
      .contains("LessThanOrEqual(l_orderkey,640)"))
    assert(pushedFor(Rel.dateFuncs.run(spark, sf0001), "orders")
      .contains("LessThanOrEqual(o_orderkey,1000)"))
    assert(pushedFor(Rel.regexFuncs.run(spark, sf0001), "part")
      .contains("LessThanOrEqual(p_partkey,500)"))
  }

  test("q1 date filter reaches the parquet scan") {
    val f = pushedFor(Tpch.q1.run(spark, sf0001), "lineitem")
    assert(f.contains("LessThanOrEqual(l_shipdate"), f)
  }

  test("q3 orders/lineitem date filters are pushed") {
    val df = Tpch.q3.run(spark, sf0001)
    assert(pushedFor(df, "orders").contains("LessThan(o_orderdate"), pushedFor(df, "orders"))
    assert(pushedFor(df, "lineitem").contains("GreaterThan(l_shipdate"), pushedFor(df, "lineitem"))
  }

  test("broadcast hints only on bounded dims (nation/region)") {
    // q5 joins 6 tables; exactly nation + region may carry explicit hints.
    val analyzed = Tpch.q5.run(spark, sf0001).queryExecution.analyzed.toString
    val hintCount = "ResolvedHint".r.findAllIn(analyzed).size
    assert(hintCount == 2, s"expected 2 broadcast hints (nation, region), got $hintCount:\n$analyzed")
  }

  test("column pruning: q6 scan reads only the 4 needed lineitem columns") {
    val df = Tpch.q6.run(spark, sf0001)
    val cols = df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet
    }.head
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"scan reads $cols")
  }
}
