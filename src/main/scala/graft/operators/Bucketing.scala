package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: pre-shuffle data once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange — the 100 TB
  * answer to "this join shuffles every night". Both sides bucketed into the
  * same count on the join key ⇒ Spark plans a zero-shuffle sort-merge join
  * (asserted in BucketingSpec). */
object Bucketing {

  /** Write `df` as a bucketed (+sorted) external parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Write `df` directory-partitioned by `partCols` — the 100 TB layout for
    * time/tenant-sliced fact tables: predicates on the partition columns
    * prune whole directories before any file IO (shows up as
    * PartitionFilters on the scan, asserted in BucketingSpec). */
  def writePartitioned(df: DataFrame, path: String,
      partCols: String*): Unit =
    df.write
      .format("parquet")
      .partitionBy(partCols: _*)
      .mode("overwrite")
      .save(path)
}
