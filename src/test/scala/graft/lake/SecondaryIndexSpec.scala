package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Value-set (bitmap-style) index for low-cardinality columns, IN-list
  * pruning, and the sorted-layout rewrite (the btree role expressed as
  * physical layout) — reference bitmap_index.go / btree_index.go /
  * index_selector.go. */
class SecondaryIndexSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-sidx-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("category", StringType),
    StructField("score", DoubleType)))

  /** 3 fragments; category is low-cardinality and fragment-local:
    * fragment i holds only categories cat-{2i, 2i+1}. id is interleaved so
    * id zonemaps overlap across fragments. */
  private def makeDs(root: String): LakeDataset = {
    val ds = LakeDataset.create(spark, root, schema)
    (0 until 3).foreach { f =>
      val data = new java.util.ArrayList[Row]()
      (0 until 300).foreach { i =>
        data.add(Row((i * 3 + f).toLong, s"cat-${2 * f + i % 2}", i / 10.0))
      }
      ds.append(spark.createDataFrame(data, schema).coalesce(1))
    }
    ds
  }

  test("value-set index prunes equality and IN on low-card columns") {
    val root = tmpDir()
    val ds = makeDs(root)
    // no index: only zonemaps; cat strings overlap lexically? min/max per
    // fragment are (cat-0,cat-1),(cat-2,cat-3),(cat-4,cat-5): zonemaps DO
    // prune here, so probe a value INSIDE a range but absent from the set
    ds.enableValueSetIndex(Seq("category"))
    assert(ds.manifest.fragments.forall(_.valueSets.nonEmpty))
    // 'cat-10' sorts inside [cat-0, cat-1]'s range (lexicographic!) but is
    // not in any fragment's value set -> 0 fragments scanned
    assert(ds.prunedFileCount("category = 'cat-10'") == 0)
    assert(ds.prunedFileCount("category = 'cat-3'") == 1)
    // IN list: union of per-value pruning
    assert(ds.prunedFileCount("category IN ('cat-0', 'cat-5')") == 2)
    assert(ds.prunedFileCount("category IN ('cat-10', 'cat-99')") == 0)
    // correctness through the scanner
    assert(ds.scanner().withFilter("category IN ('cat-0', 'cat-5')")
      .build().count() == 300)
    // new fragments maintain the set automatically
    val data = new java.util.ArrayList[Row]()
    data.add(Row(9999L, "cat-9", 1.0))
    ds.append(spark.createDataFrame(data, schema).coalesce(1))
    assert(ds.prunedFileCount("category = 'cat-9'") == 1)
  }

  test("DSv2 point lookup opens <= the value-holding fragments") {
    val root = tmpDir()
    val ds = makeDs(root)
    ds.enableValueSetIndex(Seq("category"))
    val fid = ds.manifest.fields.find(_.name == "category").get.id.toString
    def holding(v: String): Int = ds.manifest.fragments.count(
      _.valueSets.get(fid).exists(_.contains(v)))
    // the SQL door: filter pushes into the DSv2 scan, which must report
    // exactly the membership-matching fragment count via lastScan
    val q = spark.read.format("lake").load(root)
      .filter("category = 'cat-3'")
    assert(q.count() == 150)
    val (scanned, total) = LakeDataSource.lastScan(root).get
    assert(total == 3 && scanned == holding("cat-3") && scanned == 1,
      s"scanned $scanned of $total, holding=${holding("cat-3")}")
    // absent-but-in-range value: zero fragments through the same door
    assert(spark.read.format("lake").load(root)
      .filter("category = 'cat-10'").count() == 0)
    assert(LakeDataSource.lastScan(root).get._1 == 0)
  }

  test("high-cardinality fragments skip the value set (overflow)") {
    val root = tmpDir()
    val ds = makeDs(root)
    ds.enableValueSetIndex(Seq("id"), maxDistinct = 16) // 300 distinct ids
    // no fragment stores a set -> conservative: nothing wrongly pruned
    assert(ds.manifest.fragments.forall(_.valueSets.isEmpty))
    assert(ds.scanner().withFilter("id = 3").build().count() == 1)
  }

  test("IN-list pruning composes with blooms on high-card columns") {
    val root = tmpDir()
    val ds = makeDs(root)
    ds.enableBloomIndex(Seq("id"))
    // ids interleave: zonemaps keep all 3, blooms pick the right ones
    assert(ds.prunedFileCount("id IN (3, 4)") == 2) // 3 in f0, 4 in f1
    assert(ds.prunedFileCount("id IN (1000000, 2000000)") == 0)
    assert(ds.scanner().withFilter("id IN (3, 4)").build().count() == 2)
  }

  test("optimizeLayout makes zonemaps disjoint so ranges prune") {
    val root = tmpDir()
    val ds = makeDs(root)
    // interleaved ids: every fragment covers ~[0,900] -> range keeps all 3
    assert(ds.prunedFileCount("id >= 600") == 3)
    val before = ds.read().orderBy("id").collect().map(_.getLong(0)).toSeq
    ds.optimizeLayoutWith(Seq("id"), targetRows = 300)
    assert(ds.manifest.fragments.size == 3)
    // disjoint sorted ranges: the range predicate now opens 1 fragment
    assert(ds.prunedFileCount("id >= 600") == 1)
    // content + rowid stability preserved
    assert(ds.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      before)
    assert(ds.scanner().withFilter("id >= 600").build().count() ==
      before.count(_ >= 600))
  }
}
