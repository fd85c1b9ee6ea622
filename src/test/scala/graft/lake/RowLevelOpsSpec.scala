package graft.lake

import java.nio.file.Files

import graft.SparkTestBase

/** SQL UPDATE / MERGE INTO / rewrite-path DELETE through the group-based
  * row-level operation API (ReplaceData over copy-on-write fragments). */
class RowLevelOpsSpec extends SparkTestBase {

  private lazy val root = {
    val r = Files.createTempDirectory("lake-rlo-").toString
    spark.conf.set("spark.sql.catalog.rlo", "graft.lake.LakeCatalog")
    spark.conf.set("spark.sql.catalog.rlo.root", r)
    r
  }

  private def ds(name: String) = LakeDataset.open(spark, s"$root/db/$name")

  private def mk(name: String, rows: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql(s"CREATE TABLE rlo.db.$name (id BIGINT, cat STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO rlo.db.$name VALUES $rows")
  }

  test("SQL UPDATE rewrites matching rows, keeps others, preserves rowids") {
    root
    mk("u1", "(1,'a',10.0),(2,'b',20.0),(3,'a',30.0)")
    val ridsBefore = spark.sql("SELECT _rowid, id FROM rlo.db.u1").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap

    spark.sql("UPDATE rlo.db.u1 SET v = v + 1.0 WHERE cat = 'a'")

    val got = spark.sql("SELECT id, cat, v FROM rlo.db.u1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "a", 31.0)))
    // stable rowids survive the rewrite
    val ridsAfter = spark.sql("SELECT _rowid, id FROM rlo.db.u1").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(ridsAfter == ridsBefore)
    assert(ds("u1").manifest.operation == "update")
  }

  test("UPDATE with no WHERE touches every row") {
    root
    mk("u2", "(1,'a',1.0),(2,'b',2.0)")
    spark.sql("UPDATE rlo.db.u2 SET v = 0.0")
    val vs = spark.sql("SELECT v FROM rlo.db.u2").collect().map(_.getDouble(0))
    assert(vs.toSeq == Seq(0.0, 0.0))
  }

  test("UPDATE leaves non-matching fragments untouched (group pruning)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql("CREATE TABLE rlo.db.u3 (id BIGINT, cat STRING, v DOUBLE)")
    // two inserts → two fragments with disjoint id ranges
    spark.sql("INSERT INTO rlo.db.u3 VALUES (1,'a',1.0),(2,'a',2.0)")
    spark.sql("INSERT INTO rlo.db.u3 VALUES (100,'b',3.0),(200,'b',4.0)")
    val before = ds("u3").manifest.fragments.map(f => f.id -> f.file).toMap

    spark.sql("UPDATE rlo.db.u3 SET v = -1.0 WHERE id >= 100")

    val after = ds("u3").manifest.fragments.map(f => f.id -> f.file).toMap
    // the low-id fragment survived byte-identical (same id, same file)
    val keptIds = before.keySet.intersect(after.keySet)
    assert(keptIds.nonEmpty, s"no fragment survived: $before -> $after")
    assert(keptIds.forall(id => before(id) == after(id)))
    val got = spark.sql("SELECT id, v FROM rlo.db.u3 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq ==
      Seq((1L, 1.0), (2L, 2.0), (100L, -1.0), (200L, -1.0)))
  }

  test("UPDATE with NULL-evaluating predicate leaves those rows unchanged") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql("CREATE TABLE rlo.db.u4 (id BIGINT, cat STRING, v DOUBLE)")
    spark.sql(
      "INSERT INTO rlo.db.u4 VALUES (1,'a',10.0),(2,NULL,20.0),(3,'b',1.0)")
    spark.sql("UPDATE rlo.db.u4 SET v = 0.0 WHERE cat = 'a'")
    val got = spark.sql("SELECT id, v FROM rlo.db.u4 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 0.0), (2L, 20.0), (3L, 1.0)))
  }

  test("MERGE INTO updates matched and inserts unmatched with fresh rowids") {
    root
    mk("m1", "(1,'a',10.0),(2,'b',20.0)")
    spark.sql(
      """MERGE INTO rlo.db.m1 t
        |USING (SELECT * FROM VALUES (2, 'B', 99.0), (4, 'd', 40.0)
        |       AS s(id, cat, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.cat = s.cat, t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT id, cat, v FROM rlo.db.m1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq ==
      Seq((1L, "a", 10.0), (2L, "B", 99.0), (4L, "d", 40.0)))
    // all rowids distinct; merge recorded in history
    val rids = spark.sql("SELECT _rowid FROM rlo.db.m1").collect()
      .map(_.getLong(0))
    assert(rids.distinct.length == rids.length)
    assert(ds("m1").manifest.operation == "merge")
    // nextRowId advanced past every assigned id
    assert(ds("m1").manifest.nextRowId > rids.max)
  }

  test("MERGE INTO with DELETE clause removes matched rows") {
    root
    mk("m2", "(1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    spark.sql(
      """MERGE INTO rlo.db.m2 t
        |USING (SELECT * FROM VALUES (2, 0.0) AS s(id, nv)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    val ids = spark.sql("SELECT id FROM rlo.db.m2 ORDER BY id").collect()
      .map(_.getLong(0))
    assert(ids.toSeq == Seq(1L, 3L))
  }

  test("non-pushable DELETE routes through the rewrite path") {
    root
    mk("d1", "(1,'aa',10.0),(2,'bb',20.0),(3,'ab',30.0)")
    // LIKE doesn't translate in LakeFilters → SupportsDelete.canDeleteWhere
    // is false → Catalyst falls back to the group-based rewrite
    spark.sql("DELETE FROM rlo.db.d1 WHERE cat LIKE 'a%'")
    val got = spark.sql("SELECT id FROM rlo.db.d1").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L))
  }

  test("UPDATE round-trips every column type through the executor writer") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql(
      """CREATE TABLE rlo.db.ty (id BIGINT, i INT, s STRING, d DOUBLE,
        |dec DECIMAL(12,2), dt DATE, ts TIMESTAMP, b BOOLEAN,
        |arr ARRAY<INT>)""".stripMargin)
    spark.sql(
      """INSERT INTO rlo.db.ty VALUES
        |(1, 7, 'x', 1.5, 12.34, DATE '2024-03-01',
        | TIMESTAMP '2024-03-01 12:00:00', true, array(1,2)),
        |(2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)""".stripMargin)
    spark.sql("UPDATE rlo.db.ty SET i = i + 1 WHERE id = 1")
    val r = spark.sql(
      "SELECT i, s, d, dec, dt, ts, b, arr FROM rlo.db.ty WHERE id = 1")
      .collect().head
    assert(r.getInt(0) == 8)
    assert(r.getString(1) == "x")
    assert(r.getDouble(2) == 1.5)
    assert(r.getDecimal(3).toString == "12.34")
    assert(r.getDate(4).toString == "2024-03-01")
    assert(r.getTimestamp(5).toString == "2024-03-01 12:00:00.0")
    assert(r.getBoolean(6))
    assert(r.getSeq[Int](7) == Seq(1, 2))
    // NULL row untouched and still NULL everywhere
    val n = spark.sql(
      "SELECT i, s, d, dec, dt, ts, b, arr FROM rlo.db.ty WHERE id = 2")
      .collect().head
    (0 until 8).foreach(i => assert(n.isNullAt(i), s"col $i not null"))
  }

  test("MERGE runtime group filtering leaves unmatched fragments untouched") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql("CREATE TABLE rlo.db.rgf (id BIGINT, cat STRING, v DOUBLE)")
    spark.sql("INSERT INTO rlo.db.rgf VALUES (1,'a',1.0),(2,'a',2.0)")
    spark.sql("INSERT INTO rlo.db.rgf VALUES (100,'b',3.0),(200,'b',4.0)")
    val before = ds("rgf").manifest.fragments.map(_.file).toSet
    // the one fragment that contains the matched key
    val matchedFile = spark
      .sql("SELECT _file FROM rlo.db.rgf WHERE id = 100").collect()
      .map(_.getString(0)).toSet
    assert(matchedFile.size == 1)

    // source only matches id=100; no NOT MATCHED clause, so without runtime
    // group filtering EVERY fragment would be rewritten (merge pushes no
    // static filters)
    spark.sql(
      """MERGE INTO rlo.db.rgf t
        |USING (SELECT * FROM VALUES (100, 33.0) AS s(id, nv)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.nv""".stripMargin)

    val after = ds("rgf").manifest.fragments.map(_.file).toSet
    val expectedSurvivors =
      before.filterNot(f => matchedFile.contains(f.split('/').last))
    assert(expectedSurvivors.subsetOf(after),
      s"runtime group filtering did not preserve unmatched fragments: " +
        s"$before -> $after (matched: $matchedFile)")
    val got = spark.sql("SELECT id, v FROM rlo.db.rgf ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq ==
      Seq((1L, 1.0), (2L, 2.0), (100L, 33.0), (200L, 4.0)))
  }

  test("SELECT _file metadata column exposes fragment identity") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql("CREATE TABLE rlo.db.fmeta (id BIGINT)")
    spark.sql("INSERT INTO rlo.db.fmeta VALUES (1)")
    spark.sql("INSERT INTO rlo.db.fmeta VALUES (2)")
    val rows = spark.sql("SELECT _file, id FROM rlo.db.fmeta").collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows.values.forall(f => f.startsWith("frag-") &&
      f.endsWith(".parquet") && !f.contains("/")))
    assert(rows(1L) != rows(2L)) // distinct fragments
  }

  test("UPDATE after ADD COLUMN reads missing physical columns as NULL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    spark.sql("CREATE TABLE rlo.db.ev (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO rlo.db.ev VALUES (1, 1.0), (2, 2.0)")
    spark.sql("ALTER TABLE rlo.db.ev ADD COLUMN tag STRING")
    // old fragments lack the physical column for `tag`; the row-level
    // reader must surface NULLs, and the rewrite must materialize the set
    // value without corrupting pre-existing columns
    spark.sql("UPDATE rlo.db.ev SET tag = 'new' WHERE id = 1")
    val got = spark.sql("SELECT id, v, tag FROM rlo.db.ev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(got.toSeq == Seq((1L, 1.0, "new"), (2L, 2.0, null)))
  }

  test("UPDATE with IN-subquery condition") {
    root
    mk("sq1", "(1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    spark.sql(
      """UPDATE rlo.db.sq1 SET v = 0.0
        |WHERE id IN (SELECT id FROM rlo.db.sq1 WHERE cat <> 'b')""".stripMargin)
    val got = spark.sql("SELECT id, v FROM rlo.db.sq1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 0.0), (2L, 20.0), (3L, 0.0)))
  }

  test("MERGE with NOT MATCHED BY SOURCE clause") {
    root
    mk("ms1", "(1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    spark.sql(
      """MERGE INTO rlo.db.ms1 t
        |USING (SELECT * FROM VALUES (2, 99.0) AS s(id, nv)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.nv
        |WHEN NOT MATCHED BY SOURCE AND t.id = 3 THEN DELETE""".stripMargin)
    val got = spark.sql("SELECT id, v FROM rlo.db.ms1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 10.0), (2L, 99.0)))
  }

  test("SQL UPDATE tolerates a concurrent append (conflict matrix rebase)") {
    root
    mk("cc1", "(1,'a',10.0),(2,'b',20.0)")
    // interleave: plan+execute the update, and while it runs, append from a
    // second handle. DeleteUpdate-vs-Append is compatible in the matrix, so
    // the update must land without losing the appended rows.
    val appender = new Thread(() => {
      val d = ds("cc1")
      import spark.implicits._
      d.append(Seq((100L, "z", 1.5)).toDF("id", "cat", "v"))
    })
    appender.start()
    spark.sql("UPDATE rlo.db.cc1 SET v = v * 10 WHERE cat = 'a'")
    appender.join()
    val got = spark.sql("SELECT id, v FROM rlo.db.cc1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // the appended row survived regardless of commit order; row 1 updated
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 100L))
    assert(got.head._2 == 100.0)
  }

  test("UPDATE composes with merge-on-read deletion vectors") {
    root
    mk("dv1", "(1,'a',10.0),(2,'a',20.0),(3,'b',30.0)")
    ds("dv1").delete("id = 2", useDeletionVectors = true)
    spark.sql("UPDATE rlo.db.dv1 SET v = v * 2 WHERE cat = 'a'")
    val got = spark.sql("SELECT id, v FROM rlo.db.dv1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // the DV-deleted row stays deleted; survivors in its fragment rewritten
    assert(got.toSeq == Seq((1L, 20.0), (3L, 30.0)))
  }
}
