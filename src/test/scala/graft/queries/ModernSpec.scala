package graft.queries

import graft.SparkTestBase
import graft.pipeline.Clean

/** Semantics pins for the Modern family (recursive CTE, lateral top-n,
  * JSON/variant extraction, nested-type aggregation, SQL UDF) and the C4
  * boilerplate cleaner. The driver's DuckDB oracle is the cross-engine
  * gate; these tests pin the invariants a hash compare can't localize. */
class ModernSpec extends SparkTestBase {

  test("recursive CTE walks each heap-ancestor chain exactly to the root") {
    val rows = Modern.recursiveCte.run(spark, sf001).collect()
    assert(rows.length == 25)
    val byNode =
      rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // root: only itself, depth 0
    assert(byNode(0L) == (1L, 0L))
    // chain length of node k is floor(log2(k+1)) + 1 in a binary heap
    byNode.foreach { case (k, (n, d)) =>
      val expect = (63 - java.lang.Long.numberOfLeadingZeros(k + 1)) + 1
      assert(n == expect && d == expect - 1, s"node $k: ($n,$d)")
    }
  }

  test("lateral top-2 returns at most 2 suppliers per nation, sorted") {
    val rows = Modern.lateralTopn.run(spark, sf001).collect()
    val perNation = rows.groupBy(_.getString(0))
    assert(perNation.values.forall(_.length <= 2))
    perNation.values.filter(_.length == 2).foreach { g =>
      assert(g(0).getDouble(2) >= g(1).getDouble(2))
    }
  }

  test("lateral decorrelates to one windowed pass, not a per-row rescan") {
    val plan = Modern.lateralTopn.run(spark, sf001)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("LateralJoin"),
      "correlated LATERAL LIMIT should decorrelate before execution")
  }

  test("json and variant extraction round-trip typed values") {
    Seq(Modern.jsonFuncs, Modern.variantFuncs).foreach { q =>
      val rows = q.run(spark, sf001).collect()
      assert(rows.nonEmpty, q.name)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), q.name))
    }
  }

  test("nested-agg array kernels agree with the relational aggregate") {
    val got = Modern.nestedAgg.run(spark, sf001).collect()
    val want = spark.read.parquet(s"$sf001/supplier.parquet")
      .selectExpr("s_nationkey",
        "CAST(round(s_acctbal*100) AS BIGINT) AS cents")
      .groupBy("s_nationkey")
      .agg(org.apache.spark.sql.functions.expr("count(*) AS n"),
        org.apache.spark.sql.functions.expr("min(cents) AS mn"),
        org.apache.spark.sql.functions.expr("max(cents) AS mx"),
        org.apache.spark.sql.functions.expr("sum(cents) AS sm"))
      .orderBy("s_nationkey").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      (1 to 4).foreach(i => assert(g.getLong(i) == w.getLong(i)))
    }
  }

  test("SQL UDF inlines: no ScalaUDF / PythonUDF node in the plan") {
    val df = Modern.sqlUdf.run(spark, sf001)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("ScalaUDF") && !phys.contains("BatchEvalPython"))
    assert(df.collect().nonEmpty)
  }

  test("boilerplate cleaner drops exactly the corpus-frequent segments") {
    // driver-style checks, but against directly-read frames (the shared
    // `documents` temp view can be re-registered by a parallel suite)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cleaned = Clean.boilerplate.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(cleaned.nonEmpty)
    def segsOf(t: String): Seq[String] =
      t.split(' ').grouped(8).map(_.mkString(" ")).toSeq
    val freq = docs.values.toSeq.flatMap(segsOf)
      .groupBy(identity).map { case (s, g) => s -> g.size }
    // no surviving segment occurs >= 3 times in the original corpus,
    // and n_kept counts exactly the surviving segments
    cleaned.foreach { case (id, text, nKept) =>
      val kept = segsOf(docs(id)).filter(s => freq(s) < 3)
      assert(kept.mkString(" ") == text, s"doc $id reassembly")
      assert(kept.size.toLong == nKept, s"doc $id n_kept")
    }
    // fully-boilerplate docs drop out; everything else survives
    val expectIds = docs.collect {
      case (id, t) if segsOf(t).exists(s => freq(s) < 3) => id
    }.toSet
    assert(cleaned.map(_._1).toSet == expectIds)
    // word order inside every document is preserved (subsequence check)
    val pairs = cleaned.map { case (id, text, _) => (docs(id), text) }
    pairs.foreach { case (origText, keptText) =>
      val orig = origText.split(' ')
      val kept = keptText.split(' ')
      var i = 0
      kept.foreach { w =>
        while (i < orig.length && orig(i) != w) i += 1
        assert(i < orig.length, "cleaned text is not a subsequence")
        i += 1
      }
    }
  }
}
