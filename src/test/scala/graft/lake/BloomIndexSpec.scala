package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Per-fragment bloom index (reference bloomfilter_index.go +
  * index_selector.go): equality point lookups must prune fragments that
  * zonemaps alone cannot, because interleaved key ranges make every
  * fragment's [min,max] overlap every probe. */
class BloomIndexSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-bloom-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType)))

  /** 3 fragments with interleaved ids (i, i+3, i+6, …): all zonemap ranges
    * span nearly [0, 3000], so min/max pruning keeps everything. */
  private def interleaved(root: String): LakeDataset = {
    val ds = LakeDataset.create(spark, root, schema)
    (0 until 3).foreach { r =>
      val data = new java.util.ArrayList[Row]()
      (0 until 1000).foreach { i =>
        val id = (i * 3 + r).toLong
        data.add(Row(id, s"name-$id"))
      }
      ds.append(spark.createDataFrame(data, schema).coalesce(1))
    }
    ds
  }

  test("bloom prunes point lookups where zonemaps cannot") {
    val root = tmpDir()
    val ds = interleaved(root)
    assert(ds.manifest.fragments.size == 3)
    // zonemaps overlap: equality keeps all 3 fragments
    assert(ds.prunedFileCount("id = 1500") == 3)
    ds.enableBloomIndex(Seq("id"))
    // same probe now opens exactly the fragment holding 1500 (id%3==0)
    assert(ds.prunedFileCount("id = 1500") == 1)
    // a key that exists nowhere prunes everything (w.h.p. at 10 bits/row)
    assert(ds.prunedFileCount("id = 999999") == 0)
    // ranges are untouched by blooms (selector: ranges -> zonemaps)
    assert(ds.prunedFileCount("id >= 0") == 3)
    // and results stay correct through scanner + delete
    assert(ds.scanner().withFilter("id = 1500").build().count() == 1)
    assert(ds.delete("id = 1500") == 1)
    assert(ds.scanner().withFilter("id = 1500").build().count() == 0)
  }

  test("string-column bloom: literal is hashed as the column type") {
    val root = tmpDir()
    val ds = interleaved(root)
    ds.enableBloomIndex(Seq("name"))
    assert(ds.prunedFileCount("name = 'name-77'") == 1)
    assert(ds.prunedFileCount("name = 'no-such-name'") == 0)
    assert(ds.scanner().withFilter("name = 'name-77'").build().count() == 1)
  }

  test("fragments staged after enable get blooms automatically") {
    val root = tmpDir()
    val ds = interleaved(root)
    ds.enableBloomIndex(Seq("id"))
    val data = new java.util.ArrayList[Row]()
    data.add(Row(50000L, "late"))
    ds.append(spark.createDataFrame(data, schema).coalesce(1))
    assert(ds.manifest.fragments.forall(_.blooms.nonEmpty))
    assert(ds.prunedFileCount("id = 50000") == 1)
    // rewrites (delete) restage with blooms too
    ds.delete("id = 50000")
    assert(ds.manifest.fragments.forall(_.blooms.nonEmpty))
  }

  test("DSv2 point lookup benefits from bloom pruning") {
    val root = tmpDir()
    val ds = interleaved(root)
    ds.enableBloomIndex(Seq("id"))
    val got = spark.read.format("lake").load(root)
      .filter("id = 1501").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1501L))
    assert(LakeDataSource.lastScan(root).contains((1, 3)))
  }

  test("vacuum keeps referenced bloom sidecars, reaps orphans") {
    val root = tmpDir()
    val ds = interleaved(root)
    ds.enableBloomIndex(Seq("id"))
    ds.delete("id = 3") // rewrites one fragment -> orphan sidecar of old frag
    val reaped = ds.vacuum(keepVersions = 1, graceMs = 0L)
    assert(reaped >= 1)
    // index still works after vacuum
    assert(ds.prunedFileCount("id = 1500") == 1)
    assert(ds.scanner().withFilter("id = 1500").build().count() == 1)
  }
}
