package graft.lake

import java.nio.file.Files
import java.util.UUID

import graft.{Q, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-visible demonstration of the versioned dataset layer: runs a
  * deterministic CRUD+time-travel scenario against a scratch dataset seeded
  * from the `nation` table and returns a per-version summary. Rows-only
  * check by the driver; full semantics are pinned by LakeDatasetSpec. */
object LakeQueries {

  val versionedCrud: Q = Q.noOracle("lake_versioned_crud") { (s, dir) =>
    val root = Files.createTempDirectory(s"lake-demo-${UUID.randomUUID()}")
      .toString
    val nation = Tables.load(s, dir, "nation")
    val ds = LakeDataset.create(s, root, StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))))
    ds.append(nation.filter(col("n_nationkey") < 20).coalesce(1))
    ds.append(nation.filter(col("n_nationkey") >= 20).coalesce(1))
    ds.createTag("loaded")
    val deleted = ds.delete("n_regionkey = 2")
    val updated = ds.update("n_nationkey < 5", Map("n_name" -> "upper(n_name)"))
    val (matched, inserted) = ds.mergeInsert(
      s.createDataFrame(
        java.util.List.of(
          Row(Integer.valueOf(0), "MERGED", Integer.valueOf(9)),
          Row(Integer.valueOf(99), "NEW_NATION", Integer.valueOf(9))),
        ds.schema),
      keys = Seq("n_nationkey"))
    val preRestore = ds.read().count()
    ds.restore(ds.tags("loaded"))
    val restoredCount = ds.read().count()
    // deterministic one-row summary of the whole scenario
    import s.implicits._
    Seq((ds.versions.size, preRestore, deleted, updated, matched, inserted,
      restoredCount))
      .toDF("n_versions", "rows_before_restore", "n_deleted", "n_updated",
        "n_merge_matched", "n_merge_inserted", "rows_after_restore")
  }

  def all: Seq[Q] = Seq(versionedCrud)
}
