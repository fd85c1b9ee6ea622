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
    toks.groupBy("term", "_rowid").agg(count(lit(1)).as("tf"))
      .repartition(1).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$d/postings")
    toks.groupBy("_rowid").agg(count(lit(1)).cast("double").as("len"))
      .write.mode("overwrite").parquet(s"$d/doclen")
    // corpus stats from the written doclen (docs with >= 1 token) — the
    // same population bm25TopK and the refresh path's chain stats use, so
    // indexed and direct scores agree even with zero-token docs around
    ds.spark.read.parquet(s"$d/doclen")
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg("len").as("avglen"))
      .write.mode("overwrite").parquet(s"$d/stats")
    // meta.json is the COMMIT POINT (written after every data file):
    // builtVersion ignores dirs without it, so a build that dies mid-write
    // can't brick the index. The high-water marks make refresh independent
    // of dataset manifests, which vacuum may delete.
    Files.writeString(d.resolve("meta.json"),
      s"""{"tokenizer": "$tokenizer",""" +
        s""" "max_rowid": "${ds.manifest.nextRowId - 1}",""" +
        s""" "max_fragment_id": "${ds.manifest.maxFragmentId}"}""")
  }

  /** The tokenizer an index was built with. */
  def tokenizerOf(ds: LakeDataset, name: String = "fts"): String =
    metaField(ds, name, "tokenizer").getOrElse("whitespace")

  private def metaField(ds: LakeDataset, name: String,
      field: String): Option[String] = {
    val v = builtVersion(ds, name).getOrElse(
      throw new IllegalStateException(s"no FTS index '$name'"))
    metaFieldAt(ds, name, v, field)
  }

  private def metaFieldAt(ds: LakeDataset, name: String, v: Long,
      field: String): Option[String] = {
    val meta = dir(ds, name, v).resolve("meta.json")
    if (!Files.exists(meta)) None
    else (""""""" + field + """"\s*:\s*"([^"]+)"""").r
      .findFirstMatchIn(Files.readString(meta))
      .map(_.group(1))
  }

  /** Index segment dirs for the version chain ending at the latest built
    * version ≤ the dataset version: each refresh adds a DELTA segment (its
    * own postings/doclen) with a parent pointer instead of rewriting the
    * whole index — the LSM shape: extending a 100 TB index costs
    * tokenizing the appended rows, not the corpus. */
  private def segmentDirs(ds: LakeDataset, name: String,
      v: Long): Seq[java.nio.file.Path] = {
    var cur = Option(v)
    val out = Seq.newBuilder[java.nio.file.Path]
    while (cur.isDefined) {
      val d = dir(ds, name, cur.get)
      out += d
      cur = metaFieldAt(ds, name, cur.get, "parent").map(_.drop(1).toLong)
    }
    out.result()
  }

  /** Incrementally extend the index to the current dataset version:
    * tokenize ONLY rows appended since the last built version (rowids above
    * the old manifest's high-water mark, read from fragments the old
    * manifest didn't have) and write them as a delta segment. Safe across
    * deletes (search joins live rows) and compaction (rowids survive
    * rewrites); a text UPDATE changes rows in place, so those need a full
    * [[build]] — same contract as the reference's inverted index. */
  def refresh(ds: LakeDataset, textCol: String, name: String = "fts"): Unit = {
    val v0 = builtVersion(ds, name) match {
      case None => build(ds, textCol, name); return
      case Some(v) => v
    }
    if (v0 == ds.version) return
    val tokenizer = tokenizerOf(ds, name)
    // High-water marks from the built segment's own meta, NOT the dataset
    // manifest at v0 — vacuum deletes old manifests, and an index must
    // stay refreshable after them. (Manifest fallback for segments built
    // before the marks existed.)
    def legacyMan = LakeDataset.loadVersion(Paths.get(ds.root), v0)
    val maxIndexed = metaFieldAt(ds, name, v0, "max_rowid").map(_.toLong)
      .getOrElse(legacyMan.nextRowId - 1)
    // fragments beyond the built high-water mark: appended data, plus
    // compaction outputs (whose OLD rows the rowid filter screens out)
    val newFrags = metaFieldAt(ds, name, v0, "max_fragment_id")
      .map(_.toLong) match {
      case Some(mf) => ds.manifest.fragments.filter(_.id > mf)
      case None =>
        val oldIds = legacyMan.fragments.map(_.id).toSet
        ds.manifest.fragments.filterNot(f => oldIds(f.id))
    }
    val d = dir(ds, name, ds.version)
    // nothing appended (pure deletes/schema ops): the old segments already
    // cover every live row — leave the chain as-is
    if (newFrags.isEmpty) return
    val rows = ds.readFragments(ds.manifest, newFrags, withRowId = true)
      .select(col(LakeDataset.RowIdCol).as("_rowid"), col(textCol).as("text"))
      .filter(col("text").isNotNull && col("_rowid") > maxIndexed)
    // compaction-only advance: fresh fragment ids, no post-mark rowids
    if (rows.isEmpty) return
    graft.functions.GraftFunctions.register(ds.spark)
    val toks = rows.select(col("_rowid"),
      explode(Fts.tokens(col("text"), tokenizer)).as("term"))
    Files.createDirectories(d)
    toks.groupBy("term", "_rowid").agg(count(lit(1)).as("tf"))
      .repartition(1).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$d/postings")
    toks.groupBy("_rowid").agg(count(lit(1)).cast("double").as("len"))
      .write.mode("overwrite").parquet(s"$d/doclen")
    // global corpus stats re-derived from the (small) doclen segments; the
    // chain is named explicitly (new dir + old chain) because the new
    // dir's meta — the commit point — is not written yet
    val spark = ds.spark
    val allLens = (d +: segmentDirs(ds, name, v0))
      .map(sd => spark.read.parquet(s"$sd/doclen"))
      .reduce(_ unionByName _)
    allLens.agg(count(lit(1)).cast("double").as("n_docs"),
        avg("len").as("avglen"))
      .write.mode("overwrite").parquet(s"$d/stats")
    // meta last = commit point (see build)
    Files.writeString(d.resolve("meta.json"),
      s"""{"tokenizer": "$tokenizer", "parent": "v$v0",""" +
        s""" "max_rowid": "${ds.manifest.nextRowId - 1}",""" +
        s""" "max_fragment_id": "${ds.manifest.maxFragmentId}"}""")
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
    Files.list(base).iterator().asScala
      .filter(d => Files.exists(d.resolve("meta.json"))) // commit marker
      .map(_.getFileName.toString)
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
    // read every delta segment in the chain (newest dir carries the
    // refreshed global stats); a rowid appears in exactly one segment
    val segs = segmentDirs(ds, name, v)
      .filter(sd => Files.exists(sd.resolve("postings")))
    val post = spark.read
      .parquet(segs.map(sd => s"$sd/postings"): _*)
      .filter(col("term").isin(queryTerms: _*))
    val doclen = spark.read.parquet(segs.map(sd => s"$sd/doclen"): _*)
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
