package graft.lake

import java.nio.file.{Files, Paths}

import graft.pipeline.Fts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted BM25 full-text index over a [[LakeDataset]] text column —
  * counterpart of the reference's inverted index + persistence
  * (pkg/storage2/fts_index.go, fts_persistence.go).
  *
  * Layout: `<root>/_indexes/<name>/v<version>/{postings,doclen,stats}`.
  * Postings are parquet sorted by term, so a query's term filter prunes to
  * its own terms' row groups — the batch analogue of posting-list seeks
  * (WAND's skipping, fts_wand.go). Like [[VectorIndex]], postings key on
  * stable `_rowid` and join back to live data, so deletes after build
  * don't poison results. */
object FtsIndex {

  private def dir(ds: LakeDataset, name: String, v: Long) =
    Paths.get(ds.root, "_indexes", name, f"v$v%020d")

  /** Tokenize (with the named tokenizer — whitespace/simple/cjk, see
    * [[Fts.tokens]]) + persist postings/doc-lengths/corpus stats at the
    * current version. The tokenizer is recorded in the index meta so
    * queries are tokenized identically at search time. */
  def build(ds: LakeDataset, textCol: String, name: String = "fts",
      tokenizer: String = "whitespace"): Unit = {
    val rows = ds.scanner().withRowId.build()
      .select(col(LakeDataset.RowIdCol).as("_rowid"), col(textCol).as("text"))
      .filter(col("text").isNotNull)
    graft.functions.GraftFunctions.register(ds.spark)
    val toks = rows.select(col("_rowid"),
      explode(Fts.tokens(col("text"), tokenizer)).as("term"))
    val d = dir(ds, name, ds.version)
    Files.createDirectories(d)
    Files.writeString(d.resolve("meta.json"),
      s"""{"tokenizer": "$tokenizer"}""")
    toks.groupBy("term", "_rowid").agg(count(lit(1)).as("tf"))
      .repartition(1).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$d/postings")
    toks.groupBy("_rowid").agg(count(lit(1)).cast("double").as("len"))
      .write.mode("overwrite").parquet(s"$d/doclen")
    rows.agg(count(lit(1)).cast("double").as("n_docs"))
      .crossJoin(toks.groupBy("_rowid").agg(count(lit(1)).as("l"))
        .agg(avg("l").as("avglen")))
      .write.mode("overwrite").parquet(s"$d/stats")
  }

  /** The tokenizer an index was built with. */
  def tokenizerOf(ds: LakeDataset, name: String = "fts"): String = {
    val v = builtVersion(ds, name).getOrElse(
      throw new IllegalStateException(s"no FTS index '$name'"))
    val meta = dir(ds, name, v).resolve("meta.json")
    if (!Files.exists(meta)) "whitespace"
    else """"tokenizer"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(Files.readString(meta))
      .map(_.group(1)).getOrElse("whitespace")
  }

  /** Search with a free-text query, tokenized the same way the index was
    * built (a CJK query string becomes bigrams against a cjk index). */
  def searchText(ds: LakeDataset, query: String, k: Int,
      name: String = "fts"): DataFrame =
    search(ds, Fts.tokenizeQuery(query, tokenizerOf(ds, name)), k, name)

  def builtVersion(ds: LakeDataset, name: String = "fts"): Option[Long] = {
    val base = Paths.get(ds.root, "_indexes", name)
    if (!Files.exists(base)) return None
    import scala.jdk.CollectionConverters._
    Files.list(base).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("v")).map(_.drop(1).toLong)
      .filter(_ <= ds.version).maxOption
  }

  /** BM25 top-k over the persisted index; only the query terms' postings
    * are read. Results join back to live rows (delete-safe). */
  def search(ds: LakeDataset, queryTerms: Seq[String], k: Int,
      name: String = "fts"): DataFrame = {
    val spark = ds.spark
    val v = builtVersion(ds, name).getOrElse(
      throw new IllegalStateException(s"no FTS index '$name' — call build()"))
    val d = dir(ds, name, v)
    val post = spark.read.parquet(s"$d/postings")
      .filter(col("term").isin(queryTerms: _*))
    val doclen = spark.read.parquet(s"$d/doclen")
    val stats = spark.read.parquet(s"$d/stats")
    val dfreq = post.groupBy("term")
      .agg(countDistinct("_rowid").cast("double").as("df"))
    val scored = post.join(broadcast(dfreq), "term")
      .join(doclen, "_rowid")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * col("tf") * (Fts.K1 + 1.0) /
          (col("tf") + lit(Fts.K1) *
            (lit(1.0 - Fts.B) + lit(Fts.B) * col("len") / col("avglen"))))
      .groupBy("_rowid").agg(round(sum("s"), 4).as("score"))
    val live = ds.scanner().withRowId.build()
    live.join(scored.withColumnRenamed("_rowid", "_idx_rowid"),
        col(LakeDataset.RowIdCol) === col("_idx_rowid"))
      .drop("_idx_rowid")
      .orderBy(col("score").desc, col(LakeDataset.RowIdCol))
      .limit(k)
      .select((ds.schema.fieldNames.map(col) :+ col("score")): _*)
  }
}
