package graft.lake

import java.nio.file.Files

import graft.SparkTestBase

/** Merge-on-read SQL DML: with `write.dml.mode = mor`, UPDATE/DELETE write
  * rowid tombstones + delta fragments instead of rewriting whole fragments
  * (SupportsDelta / WriteDelta path). */
class MorDmlSpec extends SparkTestBase {

  private lazy val root = {
    val r = Files.createTempDirectory("lake-mor-").toString
    spark.conf.set("spark.sql.catalog.mor", "graft.lake.LakeCatalog")
    spark.conf.set("spark.sql.catalog.mor.root", r)
    r
  }

  private def ds(name: String) = LakeDataset.open(spark, s"$root/db/$name")

  private def mkMor(name: String, rows: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.db")
    spark.sql(
      s"""CREATE TABLE mor.db.$name (id BIGINT, cat STRING, v DOUBLE)
         |TBLPROPERTIES ('write.dml.mode' = 'mor')""".stripMargin)
    spark.sql(s"INSERT INTO mor.db.$name VALUES $rows")
  }

  test("TBLPROPERTIES at CREATE persists; SET/UNSET TBLPROPERTIES commits") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.db")
    spark.sql(
      """CREATE TABLE mor.db.props (id BIGINT)
        |TBLPROPERTIES ('write.dml.mode' = 'mor')""".stripMargin)
    assert(ds("props").manifest.properties("write.dml.mode") == "mor")
    spark.sql(
      "ALTER TABLE mor.db.props SET TBLPROPERTIES ('write.dml.mode' = 'cow')")
    assert(ds("props").manifest.properties("write.dml.mode") == "cow")
    spark.sql(
      "ALTER TABLE mor.db.props UNSET TBLPROPERTIES ('write.dml.mode')")
    assert(!ds("props").manifest.properties.contains("write.dml.mode"))
  }

  test("MoR UPDATE tombstones + delta fragments; originals not rewritten") {
    root
    mkMor("u1", "(1,'a',10.0),(2,'b',20.0),(3,'a',30.0)")
    val before = ds("u1").manifest.fragments.map(_.file).toSet

    spark.sql("UPDATE mor.db.u1 SET v = v + 1.0 WHERE cat = 'a'")

    val m = ds("u1").manifest
    assert(m.operation == "update_mor")
    // every original fragment file still referenced — nothing was rewritten
    assert(before.subsetOf(m.fragments.map(_.file).toSet))
    // tombstones recorded, delta fragments appended
    assert(m.deletionFiles.nonEmpty)
    assert(m.deletedRowCount == 2)
    assert(m.fragments.map(_.file).toSet.size > before.size)
    val got = spark.sql("SELECT id, cat, v FROM mor.db.u1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq ==
      Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "a", 31.0)))
  }

  test("MoR pushable DELETE routes to deletion vectors (no rewrite)") {
    root
    mkMor("d1", "(1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    val before = ds("d1").manifest.fragments.map(_.file).toSet
    spark.sql("DELETE FROM mor.db.d1 WHERE id = 2")
    val m = ds("d1").manifest
    assert(m.operation == "delete_dv")
    assert(before == m.fragments.map(_.file).toSet) // untouched data files
    assert(m.deletedRowCount == 1)
    assert(spark.sql("SELECT id FROM mor.db.d1 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("MoR non-pushable DELETE takes the delta path") {
    root
    mkMor("d2", "(1,'aa',1.0),(2,'bb',2.0),(3,'ab',3.0)")
    val before = ds("d2").manifest.fragments.map(_.file).toSet
    spark.sql("DELETE FROM mor.db.d2 WHERE cat LIKE 'a%'")
    val m = ds("d2").manifest
    assert(m.operation == "delete_dv")
    assert(before == m.fragments.map(_.file).toSet)
    assert(m.deletedRowCount == 2)
    assert(spark.sql("SELECT id FROM mor.db.d2").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("purgeDeletes folds MoR DML tombstones back into data files") {
    root
    mkMor("p1", "(1,'a',1.0),(2,'b',2.0),(3,'a',3.0)")
    spark.sql("UPDATE mor.db.p1 SET v = 0.0 WHERE cat = 'a'")
    spark.sql("DELETE FROM mor.db.p1 WHERE id = 2")
    assert(ds("p1").manifest.deletionFiles.nonEmpty)
    ds("p1").purgeDeletes()
    val m = ds("p1").manifest
    assert(m.deletionFiles.isEmpty && m.deletedRowCount == 0)
    val got = spark.sql("SELECT id, v FROM mor.db.p1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 0.0), (3L, 0.0)))
  }

  test("MoR and CoW agree on a mixed DML sequence") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor.db")
    for ((name, mode) <- Seq(("seq_mor", "mor"), ("seq_cow", "cow"))) {
      spark.sql(
        s"""CREATE TABLE mor.db.$name (id BIGINT, cat STRING, v DOUBLE)
           |TBLPROPERTIES ('write.dml.mode' = '$mode')""".stripMargin)
      spark.sql(
        s"INSERT INTO mor.db.$name VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
      spark.sql(s"UPDATE mor.db.$name SET v = v * 10 WHERE id <= 2")
      spark.sql(s"DELETE FROM mor.db.$name WHERE cat = 'b'")
      spark.sql(s"UPDATE mor.db.$name SET cat = upper(cat)")
    }
    val q = (n: String) =>
      spark.sql(s"SELECT id, cat, v FROM mor.db.$n ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(q("seq_mor") == q("seq_cow"))
    assert(q("seq_mor") == Seq((1L, "A", 10.0), (3L, "C", 3.0)))
  }

  test("MoR MERGE tombstones matched rows and appends deltas, no rewrite") {
    root
    mkMor("mg1", "(1,'a',10.0),(2,'b',20.0)")
    val before = ds("mg1").manifest.fragments.map(_.file).toSet
    spark.sql(
      """MERGE INTO mor.db.mg1 t
        |USING (SELECT * FROM VALUES (2, 'B', 99.0), (4, 'd', 40.0)
        |       AS s(id, cat, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.cat = s.cat, t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val m = ds("mg1").manifest
    assert(m.operation == "merge_mor")
    assert(before.subsetOf(m.fragments.map(_.file).toSet)) // no rewrite
    assert(m.deletedRowCount == 1) // the matched row was tombstoned
    val got = spark.sql("SELECT id, cat, v FROM mor.db.mg1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq ==
      Seq((1L, "a", 10.0), (2L, "B", 99.0), (4L, "d", 40.0)))
    val rids = spark.sql("SELECT _rowid FROM mor.db.mg1").collect()
      .map(_.getLong(0))
    assert(rids.distinct.length == rids.length)
  }

  test("MoR UPDATE assigns fresh rowids to updated rows (documented trade)") {
    root
    mkMor("rid1", "(1,'a',1.0),(2,'b',2.0)")
    val before = spark.sql("SELECT _rowid, id FROM mor.db.rid1").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    spark.sql("UPDATE mor.db.rid1 SET v = 9.0 WHERE id = 1")
    val after = spark.sql("SELECT _rowid, id FROM mor.db.rid1").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(after(2L) == before(2L)) // untouched row keeps its id
    assert(after(1L) != before(1L)) // rewritten image got a fresh id
    assert(after.values.toSeq.distinct.size == 2)
  }
}
