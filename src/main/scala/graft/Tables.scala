package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access.
  *
  * The driver parquet (TESTDATA.md) stores TPC-H-ish tables one file per
  * table; `orders.o_orderdate` / `lineitem.l_shipdate` are physically
  * timestamp[ms] (FIXTURES.md §B), midnight-aligned. Tables are loaded RAW
  * (no column rewrites): date predicates must compare the raw timestamp
  * attribute against a literal so Spark's parquet filter translation can
  * push them into the scan (row-group pruning). Casting to DateType happens
  * only in projections/grouping, never before a filter. (Round-1 verdict:
  * a `to_date()` rewrite here defeated pushdown for every query.)
  *
  * At 100 TB these reads would be directory-partitioned parquet or a DSv2
  * table; everything downstream only assumes a DataFrame with this schema,
  * so swapping the loader for a catalog table is a one-line change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp literal for RAW-attribute comparisons: the driver's date
    * columns are midnight-aligned timestamps loaded raw, and comparing
    * the attribute to a timestamp literal (never casting the attribute)
    * is what keeps the predicate pushable to parquet (round-1 verdict;
    * PlanSpec pins it). One definition, shared by every query file. */
  def ts(s: String): org.apache.spark.sql.Column = to_timestamp(lit(s))

  // Schema inference costs ~50-100 ms per parquet read; memoize the loaded
  // DataFrames per (session, dir, table) so each of the ~50 registry queries
  // doesn't re-pay it (they're immutable logical plans — safe to share).
  // Weak session keys: a closed SparkSession must not be pinned for the JVM
  // lifetime, and identity-hash collisions must not leak plans across
  // sessions.
  private val loadCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())
  private val registeredDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def sessionCache(spark: SparkSession) = {
    var m = loadCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
      loadCache.put(spark, m)
    }
    m
  }

  /** Load one table raw — filters on its columns remain pushable.
    *
    * `events.ts` has shipped in two physical encodings across driver
    * generations: timestamp[ns] (which Spark's parquet reader rejects —
    * read as a nanosecond long via the legacy conf and converted to
    * microsecond TimestampType) and timestamp[us] (read natively as
    * TIMESTAMP_NTZ — cast to TimestampType under the session's UTC zone,
    * same instants). Branch on the actual parquet schema so either
    * generation loads to the identical TimestampType column. The conf is
    * set outside the memoization so its effect doesn't depend on cache
    * state. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sessionCache(spark).computeIfAbsent((dir, name), _ =>
      if (name == "events") {
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // integer `div`, NOT `/`: epoch nanos (~1.7e18) exceed a
            // double's 2^53 exact range, so float division is ±1 µs off —
            // invisible to window membership, fatal to exact-microsecond
            // outputs (the as-of join's gap_us exposed it against DuckDB's
            // integer ns→µs)
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _: org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts",
              col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => raw
        }
      } else {
        spark.read.parquet(s"$dir/$name.parquet")
      })
  }

  /** Exact row count of a raw table from parquet footer metadata — a
    * driver-side metadata read instead of a full count() JOB inside a
    * timed query (guide §5: the driver does no data work). Used only for
    * scale-adaptive knobs (sketch accuracy, shard counts, bucket bits);
    * exact-equal to `load(...).count()` because the load is raw (no
    * filters). Not memoized — it recomputes from the input files on every
    * call. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
      else Seq(st)
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Register all tables of a scale-factor dir as temp views. Idempotent and
    * memoized per (session, dir); re-registers only when the dir changes. */
  def register(spark: SparkSession, dir: String): Unit = {
    if (registeredDir.put(spark, dir) != dir) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    }
  }
}
