package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Trained quality gate: the tree-on-weak-labels model must RECOVER the
  * heuristic gate's decisions on held-out documents it never saw, rank a
  * clean document above a degenerate one, train identically under ANY
  * partitioning (the DeterministicTree contract), and match the frozen
  * oracle tree — the sync guard for the embedded sf0.01 literal. */
class QualityModelSpec extends SparkTestBase {

  private lazy val labeled =
    QualityModel.weakLabeled(spark, sf001).cache()

  test("holdout accuracy: the learned gate recovers the heuristic gate") {
    val withBucket = labeled.withColumn("bucket",
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 5)
    val model = QualityModel.train(withBucket.filter(col("bucket") =!= 0))
    val scored = QualityModel.score(
      model, withBucket.filter(col("bucket") === 0))
    val agg = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("pred_keep") === col("label").cast("int"), 1L)
        .otherwise(0L)).as("agree"),
      sum(col("label")).as("pos")).collect().head
    val (n, agree, pos) = (agg.getLong(0), agg.getLong(1), agg.getDouble(2))
    assert(n > 50, s"holdout too small: $n")
    assert(pos > 0 && pos < n, "degenerate label distribution")
    val acc = agree.toDouble / n
    assert(acc >= 0.95, s"holdout accuracy $acc")
  }

  test("the model ranks an obviously clean doc above an obviously bad one") {
    import spark.implicits._
    val model = QualityModel.train(labeled)
    val clean = ("the history of science shows that careful measurement " +
      "and honest reporting of results with some novel ideas build " +
      "lasting knowledge over many years of work and later review").split(" ")
    val junk = Array.fill(40)("buy")
    val scored = QualityModel.score(model,
      Seq((1L, clean.toSeq), (2L, junk.toSeq)).toDF("doc_id", "tokens"))
      .select("doc_id", "prob_keep").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L),
      s"clean=${scored(1L)} junk=${scored(2L)}")
  }

  test("training is IDENTICAL under different partitionings") {
    // the DeterministicTree contract — stronger than round 7's "fixed
    // partitioning" pin: integer-count histograms on fixed grids make the
    // tree a pure function of the dataset, not of its layout
    val m1 = QualityModel.train(labeled.repartition(1))
    val m2 = QualityModel.train(labeled.repartition(32, col("doc_id")))
    assert(m1 == m2, "tree must not depend on partitioning")
    assert(m1.predSql == m2.predSql)
  }

  test("the frozen oracle tree matches a fresh sf0.01 training run") {
    // guards the FrozenPredSql literal embedded in the entry's DuckDB
    // oracle: if features/grids/gate/generator drift, this fails loudly
    // with the new literal to paste
    val fresh = QualityModel.trainedPredSql(spark, sf001)
    assert(fresh == QualityModel.FrozenPredSql,
      s"regenerate QualityModel.FrozenPredSql:\n$fresh")
  }

  test("registry scenario emits a holdout confusion matrix") {
    val rows = QualityModel.qualityModel.run(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(_.getLong(2)).sum
    val correct = rows.filter(r => r.getInt(0) == r.getInt(1))
      .map(_.getLong(2)).sum
    assert(correct.toDouble / total >= 0.95)
  }
}
