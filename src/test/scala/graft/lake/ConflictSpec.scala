package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Optimistic-commit conflict matrix (reference conflict.go:33-360) —
  * pairwise semantics via two handles racing on one dataset, plus an
  * N-thread interleaving stress: every operation either commits cleanly
  * (possibly after rebase) or raises CommitConflictException; updates are
  * never silently lost. */
class ConflictSpec extends SparkTestBase {

  import LakeDataset.OpKind._

  private def tmpDir(): String =
    Files.createTempDirectory("lake-conflict-").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def rows(r: (Long, String, Double)*) = {
    val data = new java.util.ArrayList[Row]()
    r.foreach { case (i, n, s) => data.add(Row(i, n, s)) }
    spark.createDataFrame(data, schema).coalesce(1)
  }

  test("matrix cells match the reference") {
    val e = Set.empty[Long]
    // Append row
    assert(!LakeDataset.conflicts(Append, e, Append, e))
    assert(!LakeDataset.conflicts(Append, e, DeleteUpdate, Set(1L)))
    assert(!LakeDataset.conflicts(Append, e, Rewrite, Set(1L)))
    assert(!LakeDataset.conflicts(Append, e, CreateIndex, e))
    assert(LakeDataset.conflicts(Append, e, Overwrite, e))
    assert(LakeDataset.conflicts(Append, e, Merge, e))
    assert(LakeDataset.conflicts(Append, e, Project, e))
    // Delete/Update row: fragment-overlap refinement
    assert(!LakeDataset.conflicts(DeleteUpdate, Set(1L), DeleteUpdate, Set(2L)))
    assert(LakeDataset.conflicts(DeleteUpdate, Set(1L), DeleteUpdate, Set(1L)))
    assert(!LakeDataset.conflicts(DeleteUpdate, Set(1L), Rewrite, Set(2L)))
    assert(LakeDataset.conflicts(DeleteUpdate, Set(1L), Rewrite, Set(1L, 3L)))
    assert(LakeDataset.conflicts(DeleteUpdate, Set(1L), Project, e))
    // Overwrite row: compatible with everything
    Seq(Append, DeleteUpdate, Rewrite, Merge, Overwrite, CreateIndex, Project)
      .foreach(o => assert(!LakeDataset.conflicts(Overwrite, e, o, Set(1L))))
    // Rewrite row
    assert(!LakeDataset.conflicts(Rewrite, Set(1L), Append, e))
    assert(LakeDataset.conflicts(Rewrite, Set(1L), CreateIndex, e))
    assert(LakeDataset.conflicts(Rewrite, Set(1L), Rewrite, Set(1L)))
    assert(!LakeDataset.conflicts(Rewrite, Set(1L), Rewrite, Set(9L)))
    // Merge row: only disjoint rewrite coexists
    assert(!LakeDataset.conflicts(Merge, Set(1L), Rewrite, Set(2L)))
    assert(LakeDataset.conflicts(Merge, Set(1L), Append, e))
    assert(LakeDataset.conflicts(Merge, Set(1L), DeleteUpdate, Set(9L)))
    // CreateIndex row: only overwrite conflicts
    assert(!LakeDataset.conflicts(CreateIndex, e, Append, e))
    assert(!LakeDataset.conflicts(CreateIndex, e, Merge, e))
    assert(LakeDataset.conflicts(CreateIndex, e, Overwrite, e))
    // Project row
    assert(!LakeDataset.conflicts(Project, e, Append, e))
    assert(!LakeDataset.conflicts(Project, e, Project, e))
    assert(LakeDataset.conflicts(Project, e, Merge, e))
    assert(LakeDataset.conflicts(Project, e, CreateIndex, e))
  }

  test("append rebases over delete but fails over committed overwrite") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    val h2 = LakeDataset.open(spark, root)
    // h2 deletes; h1 (stale) appends -> rebase succeeds, both effects present
    h2.delete("id = 1")
    h1.append(rows((3, "c", 3.0)))
    assert(h1.refresh().read().collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // h2 (stale) overwrites everything — wait, overwrite always wins;
    // instead: h2 commits overwrite, then stale h1 append must conflict
    val h3 = LakeDataset.open(spark, root)
    h2.refresh().overwrite(rows((9, "z", 9.0)))
    intercept[CommitConflictException](h3.append(rows((4, "d", 4.0))))
    assert(h3.refresh().read().collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("append fails over a committed schema op (stale physical schema)") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0)))
    val h2 = LakeDataset.open(spark, root)
    h2.addColumns(StructType(Seq(StructField("extra", LongType))))
    intercept[CommitConflictException](h1.append(rows((2, "b", 2.0))))
    // refreshed handle appends fine (with the new column present)
    h1.refresh()
    assert(h1.schema.fieldNames.contains("extra"))
  }

  test("disjoint deletes rebase; overlapping delete conflicts") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0), (2, "b", 2.0)))
    h1.append(rows((10, "x", 10.0), (11, "y", 11.0)))
    val h2 = LakeDataset.open(spark, root)
    // h2 deletes from fragment 2; stale h1 deletes from fragment 1: disjoint
    h2.delete("id = 10")
    assert(h1.delete("id = 1") == 1)
    assert(h1.refresh().read().collect().map(_.getLong(0)).toSet ==
      Set(2L, 11L))
    // overlapping: both target the same remaining fragment
    val h3 = LakeDataset.open(spark, root)
    h2.refresh()
    assert(h2.delete("id = 2") == 1)
    intercept[CommitConflictException](h3.delete("id = 2"))
  }

  test("merge conflicts with concurrent append (missed-insert hazard)") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0)))
    val h2 = LakeDataset.open(spark, root)
    h2.append(rows((5, "e", 5.0)))
    intercept[CommitConflictException](
      h1.mergeInsert(rows((1, "A", 9.0), (5, "E", 9.0)), Seq("id")))
  }

  test("schema op rebases over concurrent append") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0)))
    val h2 = LakeDataset.open(spark, root)
    h2.append(rows((2, "b", 2.0)))
    h1.addColumns(StructType(Seq(StructField("extra", LongType)))) // rebases
    val got = h1.refresh()
    assert(got.schema.fieldNames.contains("extra"))
    assert(got.read().count() == 2)
  }

  test("index build rebases over appends; conflicts with overwrite") {
    val root = tmpDir()
    val h1 = LakeDataset.create(spark, root, schema)
    h1.append(rows((1, "a", 1.0)))
    val h2 = LakeDataset.open(spark, root)
    h2.append(rows((2, "b", 2.0)))
    h1.enableBloomIndex(Seq("id")) // retries and indexes BOTH fragments
    assert(h1.refresh().manifest.fragments.forall(_.blooms.nonEmpty))
  }

  test("distributed compaction: planned groups commit concurrently") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    // 6 small fragments -> plan of 3 disjoint groups at targetRows=40
    (0 until 6).foreach { i =>
      ds.append(rows((0 until 20).map(j =>
        ((i * 100 + j).toLong, s"f$i", j.toDouble)): _*))
    }
    val plan = ds.planCompaction(targetRows = 40)
    assert(plan.size == 3 && plan.flatten.distinct.size == 6)
    val before = ds.read().count()
    assert(ds.compactAll(targetRows = 40, parallelism = 3) == 3)
    assert(ds.read().count() == before)
    assert(ds.manifest.fragments.size == 3) // 6 -> 3
    // each group commit is its own version, all rebased cleanly
    assert(ds.versions.size == 1 + 6 + 3)
    // re-running a stale plan conflicts (fragments are gone)
    intercept[Exception](ds.compactGroup(plan.head))
  }

  test("pluggable commit handler: injected races retry like real ones") {
    val root = tmpDir()
    val ds = LakeDataset.create(spark, root, schema)
    var publishes = 0
    var injected = false
    // simulates an object store returning 412 on the first conditional PUT
    // even though the write would have succeeded (e.g. a retryable race)
    ds.withCommitHandler(new CommitHandler {
      override def publish(target: org.apache.hadoop.fs.Path,
          content: String): Unit = {
        publishes += 1
        if (!injected) {
          injected = true
          throw new CommitConflictException("injected store race")
        }
        HardLinkCommitHandler.publish(target, content)
      }
    })
    ds.append(rows((1, "a", 1.0))) // first publish fails, retry commits
    assert(publishes >= 2)
    assert(ds.read().count() == 1)
    assert(ds.versions == Seq(1L, 2L))
  }

  test("multi-writer stress: rebase or conflict, never a lost update") {
    val root = tmpDir()
    LakeDataset.create(spark, root, schema)
    val nThreads = 4
    val nBatches = 6
    // per (thread, batch): (appended, updated, deleted) success flags
    val model = Array.fill(nThreads, nBatches)((false, false, false))
    val unexpected =
      java.util.Collections.synchronizedList(new java.util.ArrayList[Throwable])
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        val ds = LakeDataset.open(spark, root)
        (0 until nBatches).foreach { b =>
          val lo = t * 100000L + b * 100L
          def attempt(f: => Unit): Boolean =
            try { ds.refresh(); f; true }
            catch {
              case _: CommitConflictException => false
              case e: Throwable => unexpected.add(e); false
            }
          // build rows against the refreshed schema (null-fill columns a
          // concurrent addColumns introduced); a schema op that commits
          // between our refresh and our commit still conflicts via matrix
          def batchDf() = {
            val sch = ds.schema
            val data = new java.util.ArrayList[Row]()
            (0 until 10).foreach(i => data.add(Row.fromSeq(
              Seq(lo + i, s"t$t-b$b", b.toDouble) ++
                Seq.fill(sch.size - 3)(null))))
            spark.createDataFrame(data, sch).coalesce(1)
          }
          val app = attempt(ds.append(batchDf()))
          val upd = app && b % 2 == 0 && attempt {
            ds.update(s"id >= $lo AND id < ${lo + 10}",
              Map("name" -> "'upd'"))
            ()
          }
          val del = app && b % 3 == 0 && attempt {
            ds.delete(s"id >= $lo AND id < ${lo + 10}"); ()
          }
          if (b == 3) attempt(ds.compact(targetRows = 1000))
          if (b == 4) attempt(ds.addColumns(
            StructType(Seq(StructField(s"c$t", LongType)))))
          model(t)(b) = (app, upd, del)
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(unexpected.isEmpty,
      s"unexpected exceptions: ${unexpected.toString.take(500)}")

    val ds = LakeDataset.open(spark, root)
    // versions are a contiguous chain of successful commits
    val vs = ds.versions
    assert(vs == (vs.head to vs.last))
    // final content == the model: each appended-not-deleted batch present
    // with the right name, nothing else
    val got = ds.read().collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = (for {
      t <- 0 until nThreads
      b <- 0 until nBatches
      (app, upd, del) = model(t)(b)
      if app && !del
      i <- 0 until 10
    } yield (t * 100000L + b * 100L + i,
        if (upd) "upd" else s"t$t-b$b")).toMap
    assert(got.keySet == expected.keySet,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    expected.foreach { case (id, name) => assert(got(id) == name, s"id=$id") }
  }
}
