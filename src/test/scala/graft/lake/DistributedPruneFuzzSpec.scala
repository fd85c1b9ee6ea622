package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Seeded randomized equivalence: distributed fragment pruning (executor
  * StatProbes over chunk JSONL) must return EXACTLY the driver loop's
  * fragment set for every supported predicate shape — across long, double,
  * string, and timestamp columns, with nulls in play. The conservative
  * direction alone isn't enough: pruning too little hides bugs, pruning
  * too much loses rows, and the re-check design makes strict equality the
  * contract. */
class DistributedPruneFuzzSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("t", TimestampType)))

  test("driver and distributed pruning agree on a randomized matrix") {
    spark.conf.set("spark.graft.manifestChunkThreshold", "2")
    spark.conf.set("spark.graft.manifestChunkSize", "2")
    try {
      val rnd = new scala.util.Random(4242)
      val ds = LakeDataset.create(spark,
        Files.createTempDirectory("lake-fuzz-").toString, schema)
      // 12 single-fragment appends with varied ranges and some nulls
      (0 until 12).foreach { k =>
        val base = rnd.nextInt(1000)
        val rows = new java.util.ArrayList[Row]()
        (0 until 8).foreach { i =>
          val id = k * 1000L + i
          val d: java.lang.Double =
            if (rnd.nextInt(10) == 0) null
            else java.lang.Double.valueOf(base + rnd.nextDouble() * 50 - 25)
          val s: String =
            if (rnd.nextInt(12) == 0) null
            else f"w${base + rnd.nextInt(40)}%04d"
          val t = new java.sql.Timestamp(
            1700000000000L + (base + rnd.nextInt(3600)) * 1000L)
          rows.add(Row(id, d, s, t))
        }
        ds.append(spark.createDataFrame(rows, schema).coalesce(1))
      }
      assert(ds.manifest.chunkFiles.nonEmpty)

      // value-set + bloom indexes in play: the distributed path evaluates
      // value sets from the fragment JSON and leaves blooms to the driver
      // re-check — equality/IN predicates below exercise both
      ds.enableValueSetIndex(Seq("s"))
      ds.enableBloomIndex(Seq("id"))

      val preds = (0 until 30).flatMap { _ =>
        val v = rnd.nextInt(1200)
        val d = rnd.nextInt(1000) + rnd.nextDouble() * 50 - 25
        Seq(
          s"id >= ${v * 10}", s"id < ${v * 10} AND id >= ${v * 5}",
          f"d > $d%.4f", f"d <= $d%.4f",
          f"s = 'w$v%04d'",
          s"s >= 'w0${rnd.nextInt(900) + 100}'",
          s"id IN (${Seq.fill(3)(rnd.nextInt(12) * 1000 + rnd.nextInt(8)).mkString(", ")})",
          "d IS NULL", "s IS NOT NULL",
          s"t >= TIMESTAMP '2023-11-1${rnd.nextInt(5)} 0${rnd.nextInt(9)}:00:00'")
      }.distinct.take(60)

      preds.foreach { p =>
        val driver = ds.pruneFragments(ds.manifest, p).map(_.id)
        val dist =
          try {
            spark.conf.set("spark.graft.distributedPruneChunks", "1")
            ds.pruneFragments(ds.manifest, p).map(_.id)
          } finally spark.conf.unset("spark.graft.distributedPruneChunks")
        assert(dist == driver,
          s"predicate '$p': dist=$dist driver=$driver")
        // chunk-skip conservativeness: openPruned must retain every
        // fragment the driver's fragment-level pruning keeps (it may keep
        // more — chunk aggregate stats are coarser), and the filtered
        // answer through the pruned handle must match the full scan's
        val pruned = LakeDataset.openPruned(spark, ds.root, Some(p))
        val kept = pruned.manifest.fragments.map(_.id).toSet
        assert(driver.forall(kept),
          s"predicate '$p': chunk skip dropped kept fragments " +
            s"${driver.filterNot(kept)}")
        val full = ds.scanner().withFilter(p).build()
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        val viaPruned = pruned.scanner().withFilter(p).build()
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        assert(viaPruned == full, s"predicate '$p': answers diverge")
      }
    } finally {
      spark.conf.unset("spark.graft.manifestChunkThreshold")
      spark.conf.unset("spark.graft.manifestChunkSize")
    }
  }
}
