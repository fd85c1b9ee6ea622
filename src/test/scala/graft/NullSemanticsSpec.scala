package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Expression-semantics properties the reference implements by hand
  * (3-valued AND/OR/NOT: function_operator_boolean.go; comparison kernels:
  * function_scalar.go:1182-1470) and our harness relies on (double
  * normalization). Exhaustive where the domain is tiny, scalacheck where
  * it isn't. */
class NullSemanticsSpec extends SparkTestBase {

  /** Deterministic property driver: n seeded samples from a scalacheck Gen
    * (no scalatest-scalacheck bridge in the offline cache). */
  private def forAllSamples[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      gen.apply(params, Seed(42L + i)).foreach(body)
    }
  }

  private def kleeneAnd(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }

  private def kleeneOr(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }

  test("AND / OR / NOT follow Kleene 3VL exhaustively") {
    import spark.implicits._
    val domain = Seq(Some(true), Some(false), None)
    val cases = for (a <- domain; b <- domain) yield (a, b)
    val df = cases.toDF("a", "b").select(
      col("a"), col("b"),
      (col("a") && col("b")).as("and_"),
      (col("a") || col("b")).as("or_"),
      (!col("a")).as("not_"))
    df.collect().foreach { r =>
      def opt(i: Int): Option[Boolean] =
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))
      assert(opt(2) == kleeneAnd(opt(0), opt(1)), s"AND ${opt(0)} ${opt(1)}")
      assert(opt(3) == kleeneOr(opt(0), opt(1)), s"OR ${opt(0)} ${opt(1)}")
      assert(opt(4) == opt(0).map(!_), s"NOT ${opt(0)}")
    }
  }

  test("NOT IN over a list containing NULL yields no rows (3VL)") {
    // The reference plans NOT IN as a plain anti join
    // (builder_plan.go:492-506), which is NOT null-aware; Spark implements
    // ANSI 3VL. We pin Spark's semantics and document the divergence
    // (SURVEY §7.3) — oracle queries only use non-nullable keys.
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").createOrReplaceTempView("notin_t")
    val n = spark.sql(
      "SELECT count(*) AS n FROM notin_t WHERE x NOT IN (2, NULL)")
      .collect().head.getLong(0)
    assert(n == 0)
  }

  test("BETWEEN is exactly >= AND <= including null operands") {
    import spark.implicits._
    forAllSamples(Gen.listOfN(50,
      Gen.option(Gen.chooseNum(-100, 100))), n = 10) { xs: List[Option[Int]] =>
      val df = xs.toDF("x")
      val a = df.filter(col("x").between(-10, 10)).collect().toSeq.map(_.toSeq)
      val b = df.filter(col("x") >= -10 && col("x") <= 10).collect().toSeq.map(_.toSeq)
      assert(a == b)
    }
  }

  test("aggregates: avg == sum/count, sum within fp tolerance of local sum") {
    import spark.implicits._
    forAllSamples(Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)), n = 10) { xs: List[Double] =>
      val r = xs.toDF("x")
        .agg(sum("x").as("s"), avg("x").as("a"), count(lit(1)).as("n"))
        .collect().head
      val (s, a, n) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
      assert(n == xs.size)
      assert(math.abs(s - xs.sum) <= 1e-6 * math.max(1.0, xs.map(math.abs).sum))
      assert(math.abs(a - s / n) <= 1e-9 * math.max(1.0, math.abs(a)))
    }
  }

  test("count skips NULLs, count(*) does not — q13 semantics") {
    import spark.implicits._
    val df = Seq(Some(1), None, Some(3), None).toDF("x")
    val r = df.agg(count(col("x")).as("c"), count(lit(1)).as("star")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
  }
}
