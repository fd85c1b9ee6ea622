package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** CHECK constraints on lake tables: declared once, enforced inline in
  * every later write job (append / update SET / DSv2 door), with SQL
  * NULL-passes semantics and validation of existing data at declare
  * time. */
class CheckConstraintSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rows(xs: (Long, java.lang.Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*), schema)
      .coalesce(1)

  private def makeDs(): LakeDataset = {
    val ds = LakeDataset.create(spark,
      Files.createTempDirectory("ck-").toString, schema)
    ds.append(rows(1L -> 10L, 2L -> 20L))
    ds
  }

  test("violating append aborts before commit; valid append lands") {
    val ds = makeDs()
    ds.addCheckConstraint("v_pos", "v > 0")
    assert(ds.checkConstraints == Map("v_pos" -> "v > 0"))
    val v0 = ds.version
    val e = intercept[Exception] { ds.append(rows(3L -> -5L)) }
    assert(exMsg(e).contains("v_pos"), exMsg(e))
    assert(ds.refresh().version == v0, "no commit from the aborted write")
    assert(ds.read().count() == 2)
    ds.append(rows(3L -> 30L))
    assert(ds.read().count() == 3)
  }

  test("update SET values are checked") {
    val ds = makeDs()
    ds.addCheckConstraint("v_pos", "v > 0")
    val e = intercept[Exception] { ds.update("id = 1", Map("v" -> "-9")) }
    assert(exMsg(e).contains("v_pos"))
    // table unchanged; a valid update works
    assert(ds.refresh().read().filter("v < 0").count() == 0)
    ds.update("id = 1", Map("v" -> "11"))
    assert(ds.read().filter("id = 1").collect().head.getLong(1) == 11L)
  }

  test("a constraint the existing data violates is refused") {
    val ds = makeDs()
    ds.append(rows(9L -> -1L))
    val e = intercept[IllegalArgumentException] {
      ds.addCheckConstraint("v_pos", "v > 0")
    }
    assert(e.getMessage.contains("existing data"))
    assert(ds.checkConstraints.isEmpty)
  }

  test("NULL check results pass (SQL three-valued CHECK semantics)") {
    val ds = makeDs()
    ds.addCheckConstraint("v_pos", "v > 0")
    ds.append(rows(4L -> null)) // v NULL: unknown, not a violation
    assert(ds.read().count() == 3)
  }

  test("dropping the constraint stops enforcement") {
    val ds = makeDs()
    ds.addCheckConstraint("v_pos", "v > 0")
    ds.dropCheckConstraint("v_pos")
    assert(ds.checkConstraints.isEmpty)
    ds.append(rows(5L -> -1L))
    assert(ds.read().count() == 3)
  }

  test("constraints persist across reopen and guard the DSv2 write door") {
    val ds = makeDs()
    ds.addCheckConstraint("v_pos", "v > 0")
    val reopened = LakeDataset.open(spark, ds.root)
    assert(reopened.checkConstraints == Map("v_pos" -> "v > 0"))
    val e = intercept[Exception] {
      rows(6L -> -2L).write.format("lake").mode("append").save(ds.root)
    }
    assert(exMsg(e).contains("v_pos"))
    rows(6L -> 60L).write.format("lake").mode("append").save(ds.root)
    assert(reopened.refresh().read().count() == 3)
  }

  test("CALL add_check / drop_check through the SQL catalog") {
    val root = Files.createTempDirectory("ck-cat-").toString
    spark.conf.set("spark.sql.catalog.ckcat", classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.root", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS ckcat.c")
      spark.sql("CREATE TABLE ckcat.c.t (id BIGINT, v BIGINT)")
      spark.sql("INSERT INTO ckcat.c.t VALUES (1, 10)")
      spark.sql("CALL ckcat.system.add_check('c.t', 'v_pos', 'v > 0')")
      val e = intercept[Exception] {
        spark.sql("INSERT INTO ckcat.c.t VALUES (2, -1)")
      }
      assert(exMsg(e).contains("v_pos"))
      spark.sql("CALL ckcat.system.drop_check('c.t', 'v_pos')")
      spark.sql("INSERT INTO ckcat.c.t VALUES (2, -1)")
      assert(spark.sql("SELECT count(*) FROM ckcat.c.t").head().getLong(0) == 2)
    } finally {
      spark.conf.unset("spark.sql.catalog.ckcat")
      spark.conf.unset("spark.sql.catalog.ckcat.root")
    }
  }

  private def exMsg(e: Throwable): String = {
    var c: Throwable = e
    val sb = new StringBuilder
    while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
    sb.toString
  }
}
