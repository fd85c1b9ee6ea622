package graft.lake

import java.nio.file.Files

import graft.SparkTestBase

/** Name-based SQL access to lake datasets through the DSv2 TableCatalog:
  * CREATE/INSERT/SELECT/ALTER/DROP plus `VERSION AS OF` time travel. */
class LakeCatalogSpec extends SparkTestBase {

  private lazy val root = {
    val r = Files.createTempDirectory("lake-cat-").toString
    spark.conf.set("spark.sql.catalog.lakecat",
      "graft.lake.LakeCatalog")
    spark.conf.set("spark.sql.catalog.lakecat.root", r)
    r
  }

  test("create / insert / select / drop by name through SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.db")
    spark.sql("CREATE TABLE lakecat.db.people (id BIGINT, name STRING)")
    spark.sql("INSERT INTO lakecat.db.people VALUES (1, 'ada'), (2, 'bob')")
    spark.sql("INSERT INTO lakecat.db.people VALUES (3, 'eve')")
    val got = spark.sql(
      "SELECT id, name FROM lakecat.db.people ORDER BY id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "ada"), (2L, "bob"), (3L, "eve")))
    // both inserts committed through the manifest protocol
    val ds = LakeDataset.open(spark, s"$root/db/people")
    assert(ds.versions == Seq(1L, 2L, 3L))
    assert(spark.sql("SHOW TABLES IN lakecat.db").collect()
      .map(_.getString(1)).contains("people"))
    assert(spark.sql("DROP TABLE lakecat.db.people") != null)
    assert(!LakeDataset.exists(s"$root/db/people"))
  }

  test("VERSION AS OF and tag time travel through SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.tt")
    spark.sql("CREATE TABLE lakecat.tt.t (id BIGINT)")
    spark.sql("INSERT INTO lakecat.tt.t VALUES (1)")
    val ds = LakeDataset.open(spark, s"$root/tt/t")
    ds.createTag("first")
    spark.sql("INSERT INTO lakecat.tt.t VALUES (2)")
    assert(spark.sql("SELECT * FROM lakecat.tt.t").count() == 2)
    assert(spark.sql(
      "SELECT * FROM lakecat.tt.t VERSION AS OF 2").count() == 1)
    assert(spark.sql(
      "SELECT * FROM lakecat.tt.t VERSION AS OF 'first'").count() == 1)
  }

  test("ALTER TABLE add/rename/drop column route to schema evolution") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.ev")
    spark.sql("CREATE TABLE lakecat.ev.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO lakecat.ev.t VALUES (1, 'a')")
    spark.sql("ALTER TABLE lakecat.ev.t ADD COLUMN extra BIGINT")
    val r1 = spark.sql("SELECT id, name, extra FROM lakecat.ev.t").collect()
    assert(r1.head.isNullAt(2))
    spark.sql("ALTER TABLE lakecat.ev.t RENAME COLUMN name TO label")
    assert(spark.sql("SELECT label FROM lakecat.ev.t").collect()
      .head.getString(0) == "a")
    spark.sql("ALTER TABLE lakecat.ev.t DROP COLUMN extra")
    assert(!spark.table("lakecat.ev.t").columns.contains("extra"))
  }

  test("SQL DELETE FROM routes through the predicate delete") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.del")
    spark.sql("CREATE TABLE lakecat.del.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO lakecat.del.t VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("DELETE FROM lakecat.del.t WHERE id = 2")
    assert(spark.sql("SELECT id FROM lakecat.del.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the delete was a versioned copy-on-write commit
    val ds = LakeDataset.open(spark, s"$root/del/t")
    assert(ds.manifest.operation == "delete")
    // unconditional delete (truncate-shaped)
    spark.sql("DELETE FROM lakecat.del.t")
    assert(spark.sql("SELECT * FROM lakecat.del.t").count() == 0)
  }

  test("_rowid metadata column: stable ids through SQL, hidden from *") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.md")
    spark.sql("CREATE TABLE lakecat.md.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO lakecat.md.t VALUES (10,'a'), (20,'b')")
    // SELECT * must NOT include the metadata column
    assert(spark.sql("SELECT * FROM lakecat.md.t").columns.toSeq ==
      Seq("id", "name"))
    val withRid = spark.sql(
      "SELECT _rowid, id FROM lakecat.md.t ORDER BY id").collect()
    assert(withRid.map(_.getLong(0)).distinct.length == 2)
    // stable across a rewrite: delete one row, the other keeps its rowid
    val keepRid = withRid.last.getLong(0) // id=20
    spark.sql("DELETE FROM lakecat.md.t WHERE id = 10")
    val after = spark.sql(
      "SELECT _rowid, id FROM lakecat.md.t").collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((keepRid, 20L)))
  }

  test("CALL procedures: compact, optimize_zorder, vacuum through SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.mx")
    spark.sql("CREATE TABLE lakecat.mx.g (x BIGINT, y BIGINT)")
    (0 until 6).foreach { i =>
      spark.sql(s"INSERT INTO lakecat.mx.g VALUES ($i, ${5 - i})")
    }
    assert(LakeDataset.open(spark, s"$root/mx/g")
      .manifest.fragments.size == 6)

    val c = spark.sql(
      "CALL lakecat.system.compact('mx.g', 1000000)").collect().head
    assert(c.getString(1) == "compact" && c.getInt(2) == 1)

    // enough rows that the z-rewrite produces >1 fragment
    spark.sql(
      """INSERT INTO lakecat.mx.g
        |SELECT id % 50, 49 - (id % 50) FROM range(2000)""".stripMargin)
    val z = spark.sql(
      "CALL lakecat.system.optimize_zorder(`table` => 'mx.g', " +
        "cols => 'x,y', target_rows => 512)").collect().head
    assert(z.getString(1) == "optimize_zorder(x,y)")
    assert(z.getInt(2) >= 2, s"expected multiple fragments, got ${z.getInt(2)}")
    // content survives the rewrite
    assert(spark.sql("SELECT count(*) FROM lakecat.mx.g").head().getLong(0)
      == 2006)

    val v = spark.sql(
      "CALL lakecat.system.vacuum('mx.g', 2)").collect().head
    assert(v.getString(1) == "vacuum")

    val procs = spark.sql("SHOW PROCEDURES IN lakecat.system").collect()
    assert(procs.length == LakeProcedures.Names.size, procs.mkString(","))
  }

  test("CALL procedures: branch lifecycle + history through SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.br")
    spark.sql("CREATE TABLE lakecat.br.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO lakecat.br.t VALUES (1, 'a'), (2, 'b')")

    spark.sql("CALL lakecat.system.create_branch('br.t', 'work')")
    val ds = LakeDataset.open(spark, s"$root/br/t")
    val br = ds.checkoutBranch("work")
    import spark.implicits._
    br.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))

    val listed = spark.sql(
      "CALL lakecat.system.branches('br.t')").collect()
    assert(listed.map(_.getString(0)).toSeq == Seq("work"))
    assert(listed.head.getLong(1) == br.version)

    spark.sql("CALL lakecat.system.merge_branch('br.t', 'work')")
    assert(spark.sql("SELECT count(*) FROM lakecat.br.t").head().getLong(0)
      == 3)

    val hist = spark.sql(
      "CALL lakecat.system.history('br.t')").collect()
    assert(hist.map(_.getLong(0)).toSeq == hist.map(_.getLong(0)).toSeq.sorted)
    assert(hist.map(_.getString(1)).exists(_.startsWith("append")))
    assert(hist.last.getLong(0) == LakeDataset.open(spark, s"$root/br/t").version)

    spark.sql("CALL lakecat.system.drop_branch('br.t', 'work')")
    assert(spark.sql("CALL lakecat.system.branches('br.t')").collect().isEmpty)
  }

  test("CALL merge_branch(rebase => true) merges a diverged branch") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.rb")
    spark.sql("CREATE TABLE lakecat.rb.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO lakecat.rb.t VALUES (1, 'a')")
    spark.sql("CALL lakecat.system.create_branch('rb.t', 'work')")
    val ds = LakeDataset.open(spark, s"$root/rb/t")
    val br = ds.checkoutBranch("work")
    import spark.implicits._
    br.append(Seq((2L, "b")).toDF("id", "v").coalesce(1))
    spark.sql("INSERT INTO lakecat.rb.t VALUES (3, 'm')") // diverge
    // default (--ff-only) refuses the diverged merge
    val e = intercept[Exception] {
      spark.sql("CALL lakecat.system.merge_branch('rb.t', 'work')")
    }
    assert(e.getMessage.contains("fast-forward"))
    spark.sql(
      "CALL lakecat.system.merge_branch('rb.t', 'work', rebase => true)")
    assert(spark.sql("SELECT sum(id) FROM lakecat.rb.t").head().getLong(0)
      == 6)
  }

  test("CALL procedures: materialized view create + refresh through SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.mv")
    spark.sql("CREATE TABLE lakecat.mv.sales (k STRING, id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO lakecat.mv.sales VALUES ('a',1,10),('a',2,20),('b',3,5)")
    val created = spark.sql(
      "CALL lakecat.system.mv_create(`table` => 'mv.sales', " +
        "view => 'mv.sales_by_k', keys => 'k', " +
        "sum_cols => 'v', max_cols => 'v')").collect().head
    assert(created.getString(1).startsWith("mv_create"))

    def viewRows() = spark.sql(
      "SELECT k, mv_cnt, sum_v, max_v FROM lakecat.mv.sales_by_k ORDER BY k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(viewRows() == Seq(("a", 2L, 30L, 20L), ("b", 1L, 5L, 5L)))

    // DML on the base through SQL, then refresh through SQL
    spark.sql("DELETE FROM lakecat.mv.sales WHERE id = 2")
    spark.sql("INSERT INTO lakecat.mv.sales VALUES ('c', 4, 7)")
    val refreshed = spark.sql(
      "CALL lakecat.system.mv_refresh('mv.sales_by_k')").collect().head
    assert(refreshed.getString(1).contains("upserted=2"))
    assert(viewRows() ==
      Seq(("a", 1L, 10L, 10L), ("b", 1L, 5L, 5L), ("c", 1L, 7L, 7L)))

    // idempotent when already current
    spark.sql("CALL lakecat.system.mv_refresh('mv.sales_by_k')")
    assert(viewRows() ==
      Seq(("a", 1L, 10L, 10L), ("b", 1L, 5L, 5L), ("c", 1L, 7L, 7L)))

    // mv_create auto-registered the view for rewriting: a grouped
    // aggregate over the BASE is answered by the view
    val agg = spark.sql(
      "SELECT k, sum(v) AS sv FROM lakecat.mv.sales GROUP BY k")
    assert(agg.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation
          if r.relation.table.name.contains("sales_by_k") => r
    }.nonEmpty)
    assert(agg.orderBy("k").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 10L), ("b", 5L), ("c", 7L)))
    MvRewrite.unregister(spark, s"$root/mv/sales_by_k")
  }

  test("CALL procedures: JOIN materialized view create + refresh via SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.mvj")
    spark.sql("CREATE TABLE lakecat.mvj.fact (id BIGINT, ck BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO lakecat.mvj.fact VALUES (1,10,100),(2,10,20),(3,11,3)")
    spark.sql("CREATE TABLE lakecat.mvj.dim (dk BIGINT, seg STRING)")
    spark.sql("INSERT INTO lakecat.mvj.dim VALUES (10,'auto'),(11,'bank')")
    val created = spark.sql(
      "CALL lakecat.system.mv_create_join(fact => 'mvj.fact', " +
        "dims => 'mvj.dim|ck|dk|seg', view => 'mvj.by_seg', " +
        "keys => 'seg', sum_cols => 'v')").collect().head
    assert(created.getString(1).startsWith("mv_create_join"))
    def viewRows() = spark.sql(
      "SELECT seg, mv_cnt, sum_v FROM lakecat.mvj.by_seg ORDER BY seg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viewRows() == Seq(("auto", 2L, 120L), ("bank", 1L, 3L)))

    // auto-registered: the star-join aggregate is answered from the view
    val agg = spark.sql(
      """SELECT seg, sum(v) AS sv FROM lakecat.mvj.fact
        | JOIN lakecat.mvj.dim ON ck = dk GROUP BY seg""".stripMargin)
    assert(agg.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation
          if r.relation.table.name.contains("by_seg") => r
    }.nonEmpty, agg.queryExecution.optimizedPlan.toString)
    assert(agg.orderBy("seg").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("auto", 120L), ("bank", 3L)))

    // fact DML + the SAME mv_refresh door as flat views
    spark.sql("DELETE FROM lakecat.mvj.fact WHERE id = 1")
    val refreshed = spark.sql(
      "CALL lakecat.system.mv_refresh('mvj.by_seg')").collect().head
    assert(refreshed.getString(1).startsWith("mv_refresh"))
    assert(viewRows() == Seq(("auto", 1L, 20L), ("bank", 1L, 3L)))
    MvRewrite.unregister(spark, s"$root/mvj/by_seg")
  }

  test("MvRewrite answers catalog-name aggregates from the view") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.mvr")
    spark.sql("CREATE TABLE lakecat.mvr.t (k STRING, v BIGINT)")
    spark.sql("INSERT INTO lakecat.mvr.t VALUES ('a', 1), ('a', 2), ('b', 3)")
    spark.sql("CALL lakecat.system.mv_create(`table` => 'mvr.t', " +
      "view => 'mvr.t_by_k', keys => 'k', sum_cols => 'v')")
    val viewPath = s"$root/mvr/t_by_k"
    MvRewrite.register(spark, viewPath)
    try {
      val q = spark.sql("SELECT k, sum(v) AS sv FROM lakecat.mvr.t GROUP BY k")
      val scansView = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation
            if r.relation.table.name.contains("t_by_k") => r
      }.nonEmpty
      assert(scansView, q.queryExecution.optimizedPlan.toString)
      assert(q.orderBy("k").collect().map(r =>
        (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L), ("b", 3L)))
      // VERSION AS OF through the catalog is never rewritten
      val tt = spark.sql(
        "SELECT k, sum(v) AS sv FROM lakecat.mvr.t VERSION AS OF 1 GROUP BY k")
      val ttScans = tt.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation
            if r.relation.table.name.contains("t_by_k") => r
      }
      assert(ttScans.isEmpty)
    } finally MvRewrite.unregister(spark, viewPath)
  }

  test("catalog reads prune fragments like the path-based door") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakecat.pr")
    spark.sql("CREATE TABLE lakecat.pr.t (id BIGINT, name STRING)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO lakecat.pr.t VALUES (${i * 100}, 'x$i')")
    }
    val out = spark.sql(
      "SELECT * FROM lakecat.pr.t WHERE id = 100").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(100L))
    assert(LakeDataSource.lastScan(s"$root/pr/t").contains((1, 3)))
  }
}
