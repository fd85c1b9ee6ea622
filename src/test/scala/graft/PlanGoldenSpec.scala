package graft

import java.nio.file.{Files, Paths}

import graft.queries.Tpch

/** Golden physical-plan shapes for the flagship queries, so optimizer-
  * relevant regressions (lost pushdown, changed join strategy, extra
  * shuffles) fail fast. Regenerate with UPDATE_GOLDEN=1 sbt test
  * (pattern from reference golden_test.go:12-33). */
class PlanGoldenSpec extends SparkTestBase {

  private val goldenDir = Paths.get("src/test/resources/goldens")

  /** Normalize a plan string: strip expression ids, codegen ids, paths,
    * statistics — keep the operator tree + pushdown shape. */
  private def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+[L]?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("file:[^\\]\\,\\s]+", "path")
      .replaceAll("\\[id=#x\\]", "")
      .replaceAll("(?m)\\s+$", "")

  private def check(name: String, plan: String): Unit = {
    val norm = normalize(plan)
    val f = goldenDir.resolve(s"$name.txt")
    if (sys.env.contains("UPDATE_GOLDEN")) {
      Files.createDirectories(goldenDir)
      Files.writeString(f, norm)
    } else {
      assert(Files.exists(f), s"golden $f missing — run UPDATE_GOLDEN=1 sbt test")
      val expected = Files.readString(f)
      assert(norm == expected,
        s"plan for $name changed; if intended, regenerate with UPDATE_GOLDEN=1\n--- got ---\n$norm\n--- want ---\n$expected")
    }
  }

  Seq(Tpch.q1, Tpch.q3, Tpch.q5, Tpch.q6, Tpch.q10,
    graft.queries.TpchMore.q21Window).foreach { q =>
    test(s"${q.name} physical plan matches golden") {
      // Render untruncated: scan metadata is char-truncated by default, and
      // the cut point shifts with expression-id width → flaky goldens.
      spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
      spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
      check(q.name, q.run(spark, sf0001).queryExecution.sparkPlan.toString)
    }
  }
}
