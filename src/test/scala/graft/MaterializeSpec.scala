package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class MaterializeSpec extends SparkTestBase {

  test("pin switches to reliable checkpoint when checkpointDir is set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val df = Materialize.pin(Seq(1, 2, 3).toDF("x"))
      assert(df.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
      // pinned = no lineage back to the local relation
      assert(df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
      // and the blocks are FILES under the configured dir, not block-manager
      // residency — the property that survives executor loss on a cluster
      val persisted = Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => Files.isRegularFile(p)).count()
      assert(persisted > 0, s"no checkpoint files under $dir")

      // the iterative dedup paths run unchanged in reliable mode
      val docs = Tables.load(spark, sf0001, "documents")
      val pairs = pipeline.Dedup.minhashDedup(docs, 0.8)
      assert(pairs.count() > 0)
      val resolved = pipeline.Dedup.resolveClusters(pairs)
      assert(resolved.filter(col("keep")).count() > 0)
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p): Unit)
    }
  }

  test("pin defaults to localCheckpoint without the conf") {
    import spark.implicits._
    assert(spark.conf.getOption("spark.graft.checkpointDir").isEmpty)
    val df = Materialize.pin(Seq(1).toDF("x"))
    assert(df.count() == 1)
    assert(df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }
}
