package graft.pipeline

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** BPE training/tokenization: the Sennrich et al. merge loop on a known
  * toy dictionary, determinism, token round-trip, and the monotone
  * compression the learned vocabulary must buy. */
class BpeSpec extends SparkTestBase {

  test("merge loop reproduces the textbook example") {
    // Sennrich et al. 2016 §3.2 toy dictionary
    val dict = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainOnDictionary(dict, 4)
    // pair counts round 1: (e,s)=9 (newest+widest) is the max
    assert(merges.head == ("e", "s"))
    // round 2: (es,t)=9
    assert(merges(1) == ("es", "t"))
    // round 3: (est,</w>)=9
    assert(merges(2) == ("est", "</w>"))
    // round 4: (l,o)=7 (low+lower)
    assert(merges(3) == ("l", "o"))
  }

  test("tokenization round-trips and respects merge ranks") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainOnDictionary(dict, 10)
    val ranks = merges.zipWithIndex.toMap
    // a trained word collapses far; its pieces concatenate back exactly
    val toks = Bpe.tokenizeWord("newest", ranks)
    assert(toks.mkString == "newest</w>")
    assert(toks.length < "newest".length + 1)
    // an UNSEEN word still tokenizes greedily and round-trips
    val unseen = Bpe.tokenizeWord("lowest", ranks)
    assert(unseen.mkString == "lowest</w>")
  }

  test("training is deterministic, ties broken lexicographically") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val m1 = Bpe.train(docs, numMerges = 60, maxWords = 5000)
    val m2 = Bpe.train(docs, numMerges = 60, maxWords = 5000)
    assert(m1 == m2)
    assert(m1.length == 60)
    // tie-break sanity on a symmetric dictionary: (a,b) before (c,d)
    val tied = Bpe.trainOnDictionary(Seq(("ab", 3L), ("cd", 3L)), 1)
    assert(tied.head == ("a", "b"))
  }

  test("more merges never inflate the corpus token count") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text").limit(100)
    def total(n: Int): Long = {
      val merges = Bpe.train(docs, numMerges = n, maxWords = 5000)
      Bpe.tokenCounts(docs, merges)
        .agg(sum("n_bpe_tokens")).collect().head.getLong(0)
    }
    val t0 = total(0); val t50 = total(50); val t150 = total(150)
    assert(t0 > t50 && t50 > t150, s"$t0 / $t50 / $t150")
    // zero merges = characters + one end-of-word marker per word
    val chars = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")) + 1)).collect().head.getLong(0)
    assert(t0 == chars)
  }

  test("registry scenario reports per-source compression") {
    val rows = Bpe.bpeStats.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val perWordE4 = r.getLong(4)
      // learned vocab compresses: fewer than the ~5-6 char-tokens a raw
      // word would need; tiny corpora can be fully absorbed (exactly 1.0)
      assert(perWordE4 >= 10000 && perWordE4 < 60000, r.toString)
    }
  }
}
