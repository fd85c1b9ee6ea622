package graft.lake

import java.nio.file.Files

import scala.sys.process.{Process, ProcessLogger}

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Two separate JVMs compacting one dataset concurrently — the reference's
  * coordinator/worker deployment (storage2/compaction_coordinator.go +
  * compaction_worker.go). ConflictSpec and compactAll prove worker
  * *threads*; this proves worker *processes*: the optimistic manifest
  * protocol is file-based, so cross-process coordination must need no
  * shared memory or lock service. The test JVM plans all groups, hands
  * half to a spawned [[CompactWorker]] JVM, compacts the other half itself
  * while the worker runs, and value-checks the merged end state. */
class MultiProcessCompactionSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", LongType)))

  private def append100(ds: LakeDataset, base: Long): Unit = {
    val data = new java.util.ArrayList[Row]()
    (0L until 100L).foreach(i => data.add(Row(base + i, base + i)))
    ds.append(spark.createDataFrame(data, schema).coalesce(1))
  }

  test("two JVMs compact disjoint groups concurrently via the rebase protocol") {
    val root = Files.createTempDirectory("lake-mpc-").toString
    val ds = LakeDataset.create(spark, root, schema)
    (0 until 8).foreach(i => append100(ds, i * 100L))
    ds.refresh()
    assert(ds.manifest.fragments.size == 8)

    val plan = ds.planCompaction(targetRows = 200)
    assert(plan.size == 4, s"expected 4 groups of 2, got $plan")
    val (mine, theirs) = plan.zipWithIndex.partition(_._2 % 2 == 0)

    // worker JVM: same classpath + JDK17 add-opens as this (forked) JVM
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmFlags = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.toArray.map(_.toString)
      .filter(_.startsWith("--add-opens")).toSeq
    val groupsArg = theirs.map(_._1.mkString("+")).mkString(",")
    val out = new StringBuilder
    val log = ProcessLogger(l => out.synchronized {
      out.append(l).append('\n')
    })
    val worker = Process(Seq(javaBin) ++ jvmFlags ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.lake.CompactWorker", root, "200", groupsArg)).run(log)

    // race it: compact this JVM's half while the worker JVM runs
    mine.foreach { case (g, _) =>
      LakeDataset.open(spark, root).compactGroup(g, targetRows = 200)
    }
    assert(worker.exitValue() == 0,
      s"worker JVM failed:\n${out.toString.takeRight(4000)}")

    // end state: every group rewritten exactly once, nothing lost
    val end = LakeDataset.open(spark, root)
    assert(end.manifest.fragments.size == 4,
      s"8 fragments in 4 groups of 2 must compact to 4: " +
        s"${end.manifest.fragments.map(f => f.id -> f.rowCount)}")
    assert(end.manifest.fragments.forall(_.rowCount == 200))
    val got = end.read().selectExpr("count(*)", "sum(v)", "sum(id)")
      .collect().head
    assert(got.getLong(0) == 800)
    val expect = (0L until 800L).sum
    assert(got.getLong(1) == expect && got.getLong(2) == expect)
  }
}
