package graft.lake

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Type widening + shallow clone (reference AlterColumns/ShallowClone,
  * sdk/dataset.go:623-965). */
class SchemaEvolutionSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("lake-evo-").toString

  test("widen int->long: old fragments read widened, new write long") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", FloatType)))
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    val d1 = new java.util.ArrayList[Row]()
    d1.add(Row(1, 1.5f)); d1.add(Row(2, 2.5f))
    ds.append(spark.createDataFrame(d1, schema).coalesce(1))

    ds.alterColumnType("id", LongType)
    ds.alterColumnType("v", DoubleType)
    assert(ds.schema("id").dataType == LongType)
    assert(ds.schema("v").dataType == DoubleType)

    // old fragment reads at the widened type
    val old = ds.read().orderBy("id").collect()
    assert(old.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(old.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))

    // new append stores values only a long can hold; both cohorts coexist
    val wide = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType)))
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(1L << 40, 9.25))
    ds.append(spark.createDataFrame(d2, wide).coalesce(1))
    val all = ds.read().orderBy("id").collect()
    assert(all.map(_.getLong(0)).toSeq == Seq(1L, 2L, 1L << 40))
    // copy-on-write across cohorts still works
    assert(ds.delete("id = 2") == 1)
    assert(ds.read().count() == 2)
  }

  test("non-widening type changes are rejected") {
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    intercept[IllegalArgumentException](ds.alterColumnType("id", IntegerType))
    intercept[IllegalArgumentException](ds.alterColumnType("id", DoubleType))
    intercept[IllegalArgumentException](ds.alterColumnType("nope", LongType))
  }

  test("widening drops blooms on the widened field (hash domain changes)") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType)))
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    val d = new java.util.ArrayList[Row]()
    (0 until 100).foreach(i => d.add(Row(i, s"n$i")))
    ds.append(spark.createDataFrame(d, schema).coalesce(1))
    ds.enableBloomIndex(Seq("id", "name"))
    assert(ds.manifest.fragments.head.blooms.size == 2)
    ds.alterColumnType("id", LongType)
    // id bloom dropped (stale hashes would false-negative), name bloom kept
    assert(ds.manifest.fragments.head.blooms.keySet == Set("2"))
    assert(ds.manifest.bloomFields == Seq(2))
    // correctness preserved: equality scan finds the row without the bloom
    assert(ds.scanner().withFilter("id = 42").build().count() == 1)
  }

  test("shallow clone: zero-copy, then diverges independently") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val srcRoot = tmpDir()
    val src = LakeDataset.create(spark, srcRoot, schema)
    val d = new java.util.ArrayList[Row]()
    d.add(Row(1L, "a")); d.add(Row(2L, "b"))
    src.append(spark.createDataFrame(d, schema).coalesce(1))

    val cloneRoot = tmpDir()
    val clone = src.shallowClone(cloneRoot)
    // no data files copied
    assert(Files.list(java.nio.file.Paths.get(cloneRoot, "data")).count() == 0)
    assert(clone.read().count() == 2)

    // clone diverges: delete + append there only
    assert(clone.delete("id = 1") == 1)
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(9L, "z"))
    clone.append(spark.createDataFrame(d2, schema).coalesce(1))
    assert(clone.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 9L))
    // source untouched
    assert(src.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
    assert(src.version == 2)

    // clone's vacuum never reaches into the source
    clone.vacuum(keepVersions = 1, graceMs = 0L)
    assert(src.read().count() == 2)
    assert(clone.read().count() == 2)
  }

  test("appendMergeSchema: new columns arrive with their data atomically") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val ds = LakeDataset.create(spark, tmpDir(), schema)
    val d1 = new java.util.ArrayList[Row]()
    d1.add(Row(1L, "a")); d1.add(Row(2L, "b"))
    ds.append(spark.createDataFrame(d1, schema).coalesce(1))
    val v1 = ds.version

    // batch carries a NEW column and lacks an OLD one
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType)))
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(3L, 3.5))
    ds.appendMergeSchema(spark.createDataFrame(d2, s2).coalesce(1))

    // ONE commit: schema + data in the same version bump
    assert(ds.version == v1 + 1)
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val rows = ds.read().orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // old rows read NULL for the new field; new row NULL for the old one
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).getDouble(2) == 3.5)
    // identical-schema batch takes the plain append path
    val d3 = new java.util.ArrayList[Row]()
    d3.add(Row(4L, "d", 4.5))
    ds.appendMergeSchema(spark.createDataFrame(d3, ds.schema).coalesce(1))
    assert(ds.manifest.operation == "append")
    assert(ds.read().count() == 4)
    // change feed across the merge commit reports the insert, aligned to
    // the final schema
    val ch = ds.changes(v1, v1 + 1).collect()
    assert(ch.length == 1 && ch.head.getAs[String]("_change_type") == "insert"
      && ch.head.getAs[Long]("id") == 3L)
  }

  test("appendMergeSchema rebases over a concurrent plain append") {
    val root = tmpDir()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val mk = (r: Seq[(Long, String)]) => {
      val d = new java.util.ArrayList[Row]()
      r.foreach { case (i, n) => d.add(Row(i, n)) }
      spark.createDataFrame(d, schema).coalesce(1)
    }
    val writer = LakeDataset.create(spark, root, schema)
    writer.append(mk(Seq((1L, "a"))))

    // interpose on the merge-schema writer's commit: the FIRST publish
    // attempt loses to a plain append committed through a second handle
    var raced = false
    writer.withCommitHandler(new CommitHandler {
      override def publish(target: org.apache.hadoop.fs.Path,
          content: String): Unit = {
        if (!raced) {
          raced = true
          LakeDataset.open(spark, root).append(mk(Seq((2L, "b"))))
        }
        HardLinkCommitHandler.publish(target, content)
      }
    })
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType)))
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(3L, 3.5))
    writer.appendMergeSchema(spark.createDataFrame(d2, s2).coalesce(1))

    // no lost update: the interloper's row AND the merge batch both landed,
    // and the schema grew exactly once
    val ds = LakeDataset.open(spark, root)
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val rows = ds.read().orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(2).getDouble(2) == 3.5 && rows(1).isNullAt(2))
  }

  test("mergeSchema through the DSv2 write door") {
    val root = tmpDir()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val d1 = new java.util.ArrayList[Row]()
    d1.add(Row(1L, "a"))
    spark.createDataFrame(d1, schema).coalesce(1)
      .write.format("lake").mode("append").save(root)

    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", DoubleType)))
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(2L, 2.5))
    spark.createDataFrame(d2, s2).coalesce(1)
      .write.format("lake").option("mergeSchema", "true")
      .mode("append").save(root)

    val ds = LakeDataset.open(spark, root)
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "extra"))
    val rows = ds.read().orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 2.5)
  }

  test("overwrite + mergeSchema evolves the schema in the same commit") {
    // Round-4 ADVICE: this combination previously skipped alignment and
    // silently dropped the new column (or failed when an old one was absent).
    val root = tmpDir()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val d1 = new java.util.ArrayList[Row]()
    d1.add(Row(1L, "a"))
    spark.createDataFrame(d1, schema).coalesce(1)
      .write.format("lake").mode("append").save(root)
    val v1 = LakeDataset.open(spark, root).version

    // overwrite batch: NEW column `extra`, OLD column `name` absent
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", DoubleType)))
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(7L, 7.5))
    spark.createDataFrame(d2, s2).coalesce(1)
      .write.format("lake").option("mergeSchema", "true")
      .mode("overwrite").save(root)

    val ds = LakeDataset.open(spark, root)
    assert(ds.version == v1 + 1) // schema + replacement in ONE commit
    assert(ds.manifest.operation == "overwrite_merge_schema")
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "extra"))
    val rows = ds.read().collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 7L && rows(0).isNullAt(1)
      && rows(0).getDouble(2) == 7.5)
    // time travel still reads the pre-overwrite data in the old schema
    assert(ds.readVersion(v1).columns.toSeq == Seq("id", "name"))
  }

  test("appendMergeSchema resolves column names case-insensitively") {
    // Round-4 ADVICE: a batch column differing only in case ("ID" vs "id")
    // must not be added as a duplicate field.
    val ds = LakeDataset.create(spark, tmpDir(), StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType))))
    val d1 = new java.util.ArrayList[Row]()
    d1.add(Row(1L, "a"))
    ds.append(spark.createDataFrame(d1,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("name", StringType)))).coalesce(1))

    val s2 = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("score", DoubleType)))
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(2L, 2.5))
    ds.appendMergeSchema(spark.createDataFrame(d2, s2).coalesce(1))

    // no duplicate id/ID field; score added once; both rows readable
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val rows = ds.read().orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 2.5)
  }

  test("dropNestedField rewrites the struct, keeps rowids and history") {
    val inner = StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType)))
    val meta = StructType(Seq(
      StructField("tag", StringType),
      StructField("score", IntegerType),
      StructField("inner", inner)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", meta)))
    val ds = LakeDataset.create(spark,
      java.nio.file.Files.createTempDirectory("lake-droppath-").toString,
      schema)
    val d = new java.util.ArrayList[Row]()
    d.add(Row(1L, Row("a", 10, Row(1, 2))))
    d.add(Row(2L, Row("b", 20, Row(3, 4))))
    ds.append(spark.createDataFrame(d, schema).coalesce(1))
    val vBefore = ds.version
    val ridsBefore = ds.scanner().withRowId.build()
      .select("id", "_rowid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // drop a top-of-struct field
    ds.dropNestedField("meta", "score")
    assert(ds.version == vBefore + 1)
    assert(ds.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("tag", "inner"))
    // drop a nested-nested field by dotted path
    ds.dropNestedField("meta", "inner.y")
    val metaT = ds.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaT("inner").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("x"))

    val out = ds.read().orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getStruct(1).getString(0) == "a")
    assert(out(0).getStruct(1).getStruct(1).getInt(0) == 1)
    // rowids preserved through both rewrites
    val ridsAfter = ds.scanner().withRowId.build()
      .select("id", "_rowid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ridsAfter == ridsBefore)
    // history: the pre-drop version still reads the dropped field
    val old = ds.readVersion(vBefore).orderBy("id").collect()
    assert(old(0).getStruct(1).getInt(1) == 10)

    // bad paths fail fast
    intercept[IllegalArgumentException] {
      ds.dropNestedField("meta", "nope")
    }
    intercept[IllegalArgumentException] {
      ds.dropNestedField("id", "x")
    }

    // symmetric add: new nested field arrives NULL for existing rows,
    // writable by later appends
    ds.addNestedField("meta", "inner.z", IntegerType)
    val innerT = ds.schema("meta").dataType.asInstanceOf[StructType]
      .apply("inner").dataType.asInstanceOf[StructType]
    assert(innerT.fieldNames.toSeq == Seq("x", "z"))
    val withZ = ds.read().orderBy("id").collect()
    assert(withZ(0).getStruct(1).getStruct(1).isNullAt(1))
    val d3 = new java.util.ArrayList[Row]()
    d3.add(Row(3L, Row("c", Row(9, 99))))
    ds.append(spark.createDataFrame(d3, ds.schema).coalesce(1))
    val r3 = ds.read().filter("id = 3").collect().head
    assert(r3.getStruct(1).getStruct(1).getInt(1) == 99)
    intercept[IllegalArgumentException] {
      ds.addNestedField("meta", "inner.z", IntegerType) // exists
    }

    // data-preserving nested rename (copy + drop in one rewrite)
    ds.renameNestedField("meta", "tag", "label")
    val metaT2 = ds.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaT2.fieldNames.contains("label")
      && !metaT2.fieldNames.contains("tag"))
    val renamed = ds.read().orderBy("id").collect()
    val labelIdx = metaT2.fieldIndex("label")
    assert(renamed(0).getStruct(1).getString(labelIdx) == "a")
    assert(renamed(2).getStruct(1).getString(labelIdx) == "c")
    ds.renameNestedField("meta", "inner.x", "w")
    val innerT2 = ds.schema("meta").dataType.asInstanceOf[StructType]
      .apply("inner").dataType.asInstanceOf[StructType]
    assert(innerT2.fieldNames.toSeq.sorted == Seq("w", "z"))
    val r1 = ds.read().filter("id = 1").collect().head
    assert(r1.getStruct(1).getStruct(metaT2.fieldIndex("inner"))
      .getInt(innerT2.fieldIndex("w")) == 1)
  }

  test("append racing a nested drop conflicts instead of mixing shapes") {
    val meta = StructType(Seq(
      StructField("tag", StringType), StructField("score", IntegerType)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", meta)))
    val root = java.nio.file.Files
      .createTempDirectory("lake-droppath-race-").toString
    val a = LakeDataset.create(spark, root, schema)
    val d = new java.util.ArrayList[Row]()
    d.add(Row(1L, Row("a", 10)))
    a.append(spark.createDataFrame(d, schema).coalesce(1))

    val b = LakeDataset.open(spark, root) // stale handle, old schema
    a.dropNestedField("meta", "score")

    // b stages rows in the OLD struct shape; its commit loses the race and
    // the conflict matrix (append vs the nested op's Overwrite kind) must
    // refuse the rebase — landing old-shape fragments into the new-schema
    // manifest would read back wrong
    val d2 = new java.util.ArrayList[Row]()
    d2.add(Row(2L, Row("b", 20)))
    intercept[CommitConflictException] {
      b.append(spark.createDataFrame(d2, schema).coalesce(1))
    }
    // the dataset is untouched by the failed append
    assert(a.refresh().read().count() == 1)
  }
}
