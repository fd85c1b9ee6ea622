package graft.lake

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class VectorIndexSpec extends SparkTestBase {

  private def makeDs(): LakeDataset = {
    val dir = Files.createTempDirectory("vecidx-").toString
    val ds = LakeDataset.create(spark, dir, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType)))))
    ds.append(Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "label", "embedding").coalesce(2))
    ds
  }

  private def queryVec(ds: LakeDataset): Seq[Float] = {
    import scala.jdk.CollectionConverters._
    ds.read().filter(col("vec_id") === 0)
      .select("embedding").collect().head
      .getList[Float](0).asScala.toSeq
  }

  test("probing all clusters reproduces exact brute-force top-k") {
    val ds = makeDs()
    val q = queryVec(ds)
    val brute = VectorIndex.search(ds, "embedding", q, k = 10) // no index yet
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    VectorIndex.build(ds, "embedding")
    assert(VectorIndex.builtVersion(ds, "ivf").contains(ds.version))
    val full = VectorIndex.search(ds, "embedding", q, k = 10,
      nprobe = VectorIndex.DefaultClusters)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(full.toSeq == brute.toSeq)
  }

  test("probed search prunes but overlaps exact; prefilter composes") {
    val ds = makeDs()
    val q = queryVec(ds)
    VectorIndex.build(ds, "embedding")
    val probed = VectorIndex.search(ds, "embedding", q, k = 10, nprobe = 4)
      .collect()
    assert(probed.length == 10)
    val pre = VectorIndex.search(ds, "embedding", q, k = 5, nprobe = 16,
      prefilter = Some("label = 3")).collect()
    assert(pre.nonEmpty && pre.forall(_.getInt(1) == 3))
  }

  test("index stays consistent under later deletes (stable rowid join)") {
    val ds = makeDs()
    val q = queryVec(ds)
    VectorIndex.build(ds, "embedding")
    val before = VectorIndex.search(ds, "embedding", q, k = 5,
      nprobe = VectorIndex.DefaultClusters)
      .collect().map(_.getLong(0))
    val victim = before(1)
    ds.delete(s"vec_id = $victim")
    val after = VectorIndex.search(ds, "embedding", q, k = 5,
      nprobe = VectorIndex.DefaultClusters)
      .collect().map(_.getLong(0))
    assert(!after.contains(victim))
    // the rest of the ranking is unchanged
    assert(after.take(1).toSeq == before.take(1).toSeq)
  }
}
