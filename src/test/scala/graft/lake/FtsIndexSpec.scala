package graft.lake

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FtsIndexSpec extends SparkTestBase {

  private def makeDs(): LakeDataset = {
    val dir = Files.createTempDirectory("ftsidx-").toString
    val ds = LakeDataset.create(spark, dir, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))))
    ds.append(Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").coalesce(2))
    ds
  }

  test("indexed BM25 search matches the on-the-fly scorer") {
    val ds = makeDs()
    FtsIndex.build(ds, "text")
    val terms = Seq("spark", "table", "scan")
    val indexed = FtsIndex.search(ds, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val direct = graft.pipeline.Fts.bm25TopK(
      Tables.load(spark, sf0001, "documents"), terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(indexed.toSeq == direct.toSeq)
  }

  test("detached append + FTS/vector indexes survive deletes") {
    val ds = makeDs()
    FtsIndex.build(ds, "text")
    val top = FtsIndex.search(ds, Seq("spark", "table", "scan"), k = 5)
      .collect().map(_.getLong(0))
    ds.delete(s"doc_id = ${top.head}")
    val after = FtsIndex.search(ds, Seq("spark", "table", "scan"), k = 5)
      .collect().map(_.getLong(0))
    assert(!after.contains(top.head))
    assert(after.take(3).toSeq == top.slice(1, 4).toSeq)
  }

  test("cjk tokenizer: bigrams + latin words, exact segmentation") {
    import graft.functions.TextTokens
    assert(TextTokens.cjkTokenize("Spark数据处理engine") ==
      Seq("spark", "数据", "据处", "处理", "engine"))
    assert(TextTokens.cjkTokenize("数") == Seq("数"))
    assert(TextTokens.cjkTokenize("one two!") == Seq("one", "two"))
    assert(TextTokens.cjkTokenize("db数据库") == Seq("db", "数据", "据库"))
    assert(TextTokens.cjkTokenize("") == Seq.empty)
  }

  test("cjk index: a CJK query retrieves CJK docs via bigram postings") {
    val dir = Files.createTempDirectory("ftscjk-").toString
    val ds = LakeDataset.create(spark, dir, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))))
    ds.append(spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, "分布式数据处理引擎"),
      org.apache.spark.sql.Row(2L, "机器学习模型训练"),
      org.apache.spark.sql.Row(3L, "spark is a data engine")), ds.schema))
    // whitespace tokenization can't find anything inside unsegmented CJK
    FtsIndex.build(ds, "text", name = "ws", tokenizer = "whitespace")
    assert(FtsIndex.searchText(ds, "数据处理", k = 3, name = "ws")
      .collect().isEmpty)
    // cjk bigrams can
    FtsIndex.build(ds, "text", name = "cjk", tokenizer = "cjk")
    assert(FtsIndex.tokenizerOf(ds, "cjk") == "cjk")
    val hits = FtsIndex.searchText(ds, "数据处理", k = 3, name = "cjk")
      .collect().map(_.getLong(0))
    assert(hits.headOption.contains(1L), s"hits=${hits.toSeq}")
    assert(!hits.contains(2L))
  }

  test("simple tokenizer index matches the simple direct scorer") {
    val ds = makeDs()
    FtsIndex.build(ds, "text", name = "simple", tokenizer = "simple")
    val terms = Seq("spark", "table", "scan")
    val indexed = FtsIndex.search(ds, terms, k = 10, name = "simple")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val direct = graft.pipeline.Fts.bm25TopK(
      Tables.load(spark, sf0001, "documents"), terms, 10,
      tokenizer = "simple")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(indexed.toSeq == direct.toSeq)
  }

  test("stageAppend is invisible until commitStaged (two-phase)") {
    val ds = makeDs()
    val before = ds.read().count()
    val staged = ds.stageAppend(
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(99999L, "late arrival")),
        ds.schema))
    assert(ds.read().count() == before) // phase 1 not visible
    ds.commitStaged(staged)
    assert(ds.read().count() == before + 1)
    assert(ds.read().filter(col("doc_id") === 99999L).count() == 1)
  }
}
