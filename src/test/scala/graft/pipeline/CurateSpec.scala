package graft.pipeline

import graft.SparkTestBase

class CurateSpec extends SparkTestBase {

  test("hash sampling is deterministic and respects per-source rates") {
    val a = Curate.hashSample.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Curate.hashSample.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b, "sampling must be a pure function of the data")
    assert(a.nonEmpty && a.values.forall(_._1 > 0))
    // srcN's configured rate is (8192 + 2048*(N%8))/65536; with ~25
    // docs/source the kept fraction is noisy, so only pin the rate ORDER
    // property in aggregate: the four lowest-rate sources (N%8==0,1)
    // together keep fewer docs than the four highest (N%8==6,7)
    def total(mods: Set[Int]) = a.collect {
      case (s, (n, _)) if mods.contains(s.drop(3).toInt % 8) => n
    }.sum
    assert(total(Set(0, 1)) < total(Set(6, 7)),
      s"low-rate sources should keep fewer docs: $a")
  }

  test("split is disjoint, exhaustive, and roughly 5/10/85") {
    val rows = Curate.split.run(spark, sf0001).collect()
    val bySplit = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(total == 500, s"every doc lands in exactly one split: $bySplit")
    assert(bySplit.keySet == Set("train", "val", "test"))
    val testFrac = bySplit("test").toDouble / total
    val valFrac = bySplit("val").toDouble / total
    assert(testFrac > 0.01 && testFrac < 0.12, s"test ~5%: $testFrac")
    assert(valFrac > 0.04 && valFrac < 0.20, s"val ~10%: $valFrac")
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }

  test("token budget keeps longest docs first within 25% of corpus tokens") {
    val r = Curate.tokenBudget.run(spark, sf0001).collect().head
    val (kept, toks, cutoff) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(kept > 0 && toks > 0)
    // total corpus tokens via the same estimator
    import org.apache.spark.sql.functions._
    val total = graft.Tables.load(spark, sf0001, "documents")
      .agg(sum(floor((col("n_chars") + 3) / 4).cast("long"))).head().getLong(0)
    assert(toks <= total / 4 + 1, s"kept $toks of $total exceeds the budget")
    // every kept doc is at least as long as the cutoff; docs above the
    // cutoff are all kept — verify the count matches a direct filter
    val directCount = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("n_chars") >= cutoff).count()
    assert(directCount == kept,
      s"bucket selection must equal the >=cutoff filter: $directCount vs $kept")
  }

  test("domain cap keeps at most 10 per source, ranked by hash not arrival") {
    import org.apache.spark.sql.functions._
    val kept = Curate.domainCap.run(spark, sf001).cache()
    try {
      val perSource = kept.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perSource.values.forall(_ <= 10))
      assert(perSource.values.exists(_ == 10), "cap never binds — vacuous")
      // rank 1..k contiguous per source
      val ranks = kept.groupBy("source")
        .agg(min("rk").as("lo"), max("rk").as("hi"), count(lit(1)).as("n"))
      assert(ranks.filter(col("lo") =!= 1 || col("hi") =!= col("n"))
        .count() == 0)
      // deterministic: the kept doc set is hash-derived, so a rerun agrees
      val again = Curate.domainCap.run(spark, sf001)
      assert(kept.select("doc_id").except(again.select("doc_id")).count() == 0)
    } finally { kept.unpersist(); () }
  }

  test("seeded shuffle is a permutation: contiguous positions per shard") {
    import org.apache.spark.sql.functions._
    val out = Curate.shuffle.run(spark, sf001).cache()
    try {
      assert(out.count() == 500) // every doc appears exactly once
      assert(out.select("doc_id").distinct().count() == 500)
      val perShard = out.groupBy("shard")
        .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("n"))
      assert(perShard.filter(col("lo") =!= 1 || col("hi") =!= col("n"))
        .count() == 0, "positions must be 1..n per shard")
      assert(out.select("shard").distinct().count() > 1)
    } finally { out.unpersist(); () }
  }

  test("chunking covers every token, overlaps by size-stride, reassembles") {
    import spark.implicits._
    val chunks = Curate.chunk.run(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("chunk_text")))
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toks = docs(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      // indices are dense from 0
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      // every chunk is the exact token window it claims
      sorted.foreach { case (_, idx, n, text) =>
        val start = (idx * 48).toInt
        val want = toks.slice(start, start + 64)
        assert(text == want.mkString(" "), s"doc $id chunk $idx")
        assert(n == want.length)
      }
      // stride-coverage: concatenating each chunk's first `stride` tokens
      // (plus the tail of the last) reassembles the document exactly
      val rebuilt = sorted.flatMap { case (_, idx, _, text) =>
        val t = text.split(" ", -1)
        if (idx == sorted.last._2) t else t.take(48)
      }
      assert(rebuilt.toSeq == toks.toSeq, s"doc $id reassembly")
    }
  }
}
