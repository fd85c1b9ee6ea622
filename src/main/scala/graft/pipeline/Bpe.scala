package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training + tokenization (Sennrich,
  * Haddow & Birch, ACL 2016 "Neural Machine Translation of Rare Words
  * with Subword Units" — the public algorithm; [[TextOps]]' token
  * ESTIMATE regex approximates what this learns for real).
  *
  * The scale split is the standard one (and the only one that works at
  * 100 TB): the corpus-sized pass is a single word-frequency aggregation
  * — shuffle carries (word, count) pairs, nothing else — and the merge
  * loop then runs on the COMPACT top-N dictionary on the driver, exactly
  * as reference tokenizer trainers do. Corpus size buys better counts,
  * not more merge-loop work: merge cost is O(numMerges × dictionary).
  * Tokenization re-distributes: the learned merge ranks broadcast to a
  * `mapPartitions` greedy-merge kernel, a narrow per-row pass. */
object Bpe {

  private val EndOfWord = "</w>"

  /** Distributed word-frequency dictionary: the one corpus-sized pass.
    * Top `maxWords` by (count desc, word asc) — deterministic under ties
    * — bounds driver memory regardless of corpus size. */
  def wordFrequencies(docs: DataFrame, maxWords: Int): Seq[(String, Long)] = {
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Classic BPE merge loop over the compact dictionary: each iteration
    * merges the most frequent adjacent symbol pair (ties broken by the
    * lexicographically smallest pair, so training is deterministic).
    * Returns the ordered merge list. */
  def trainOnDictionary(dict: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = dict.map { case (w, c) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, c)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      words = words.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == best._1 &&
              syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toArray, c)
      }
      m += 1
    }
    merges.result()
  }

  /** End-to-end training: aggregate the dictionary, run the merge loop. */
  def train(docs: DataFrame, numMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] =
    trainOnDictionary(wordFrequencies(docs, maxWords), numMerges)

  /** Tokenize one word with learned merges: rank-greedy (always merge
    * the lowest-rank pair present — equivalent to replaying merges in
    * training order), the standard apply-time kernel. */
  def tokenizeWord(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = (word.map(_.toString) :+ EndOfWord).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Per-doc BPE token counts: merge ranks broadcast, narrow kernel. */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val ranksB = s.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .as[(Long, String, Seq[String])]
      .mapPartitions { rows =>
        val ranks = ranksB.value
        rows.map { case (id, src, ws) =>
          var n = 0L
          var chars = 0L
          ws.foreach { w =>
            if (w.nonEmpty) {
              n += tokenizeWord(w, ranks).length
              chars += w.length
            }
          }
          (id, src, ws.count(_.nonEmpty).toLong, n, chars)
        }
      }
      .toDF("doc_id", "source", "n_words", "n_bpe_tokens", "n_chars")
  }

  /** Registry scenario: train 200 merges on the corpus's word-frequency
    * dictionary, tokenize every document, report per-source totals and
    * the corpus compression the learned vocabulary buys (tokens per word
    * shrinks as merges absorb frequent character sequences). Fixed-point
    * BIGINT ratio output; deterministic end to end (tie-broken merges). */
  val bpeStats: Q = Q.noOracle("text_bpe_stats") { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .select("doc_id", "source", "text")
    val merges = train(d, numMerges = 200, maxWords = 20000)
    tokenCounts(d, merges)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe_tokens").as("n_bpe_tokens"),
        expr("CAST(sum(n_bpe_tokens) * 10000 div sum(n_words) AS BIGINT)")
          .as("tokens_per_word_e4"))
      .orderBy("source")
  }

  def all: Seq[Q] = Seq(bpeStats)
}
