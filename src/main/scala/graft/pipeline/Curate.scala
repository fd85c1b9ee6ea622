package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data assembly (beyond-reference
  * pipeline mandate): deterministic hash sampling / weighted source mixing,
  * train-val-test splitting, and token-budget selection. Everything keys on
  * `md5(doc_id)` — a pure function of the row — so membership is stable
  * across runs, engines, partitionings, and re-shards (the property random
  * sampling loses the moment data moves). All decisions are narrow per-row
  * projections; the only shuffles are the final count aggregations — the
  * 100 TB shape.
  *
  * Exact-arithmetic discipline for the oracles: the sampling hash is an
  * INTEGER in [0, 65535] (first 4 md5 hex digits), thresholds are integers,
  * token estimates use floor() on int math — no doubles anywhere a row
  * membership decision is made, so Spark and DuckDB agree bit-for-bit. */
object Curate {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** 16-bit uniform hash of the doc id: first 4 hex digits of md5. */
  private def hash16 = conv(
    substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")

  /** Per-source sampling rate out of 65536, derived from the source's
    * numeric suffix: srcN keeps (8192 + 2048·(N mod 8)) / 65536 ∈
    * [12.5%, 34.4%] — a deterministic stand-in for the per-source weights
    * of a real data-mixing recipe. */
  private def rate16 =
    lit(8192) + lit(2048) * (substring(col("source"), 4, 10).cast("int") % 8)

  /** Stratified hash sampling = weighted source mixing: keep each doc iff
    * hash16(doc_id) < rate(source); report kept volume per source. */
  val hashSample = Q(
    "curate_hash_sample",
    """SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
      |FROM (
      |  SELECT source, n_chars,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
      |      AS INT) AS h,
      |    8192 + 2048 * (CAST(substr(source, 4) AS INT) % 8) AS rate
      |  FROM documents) t
      |WHERE h < rate
      |GROUP BY source""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .filter(hash16 < rate16)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").cast("long").as("chars_kept"))
  }

  /** Deterministic train/val/test split by hash range: 5% test, 10% val,
    * 85% train — disjoint and exhaustive by construction (one hash, three
    * ranges), and a doc never migrates between splits when the corpus is
    * re-sharded or appended to. */
  val split = Q(
    "curate_split",
    """SELECT source, split,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_total
      |FROM (
      |  SELECT source, n_chars,
      |    CASE
      |      WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
      |        AS INT) < 3277 THEN 'test'
      |      WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
      |        AS INT) < 9830 THEN 'val'
      |      ELSE 'train'
      |    END AS split
      |  FROM documents) t
      |GROUP BY source, split""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .withColumn("split",
        when(hash16 < 3277, "test")
          .when(hash16 < 9830, "val")
          .otherwise("train"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("chars_total"))
  }

  /** Token-budget selection, scale-shaped: instead of a global running sum
    * over every doc (a single-partition window at 100 TB), aggregate token
    * mass per length bucket (one shuffle over ~hundreds of distinct
    * lengths), take the tiny cumulative sum over buckets, and keep every
    * bucket while the running total fits 25% of the corpus' tokens —
    * longest docs first. Budget refinement inside the boundary bucket is a
    * second cheap pass if ever needed; whole-bucket granularity keeps the
    * decision deterministic. */
  val tokenBudget = Q(
    "curate_token_budget",
    """WITH per AS (
      |  SELECT n_chars, count(*) AS n_docs,
      |    CAST(sum(CAST(floor((n_chars + 3) / 4) AS BIGINT)) AS BIGINT)
      |      AS toks
      |  FROM documents GROUP BY n_chars),
      |cum AS (
      |  SELECT n_chars, n_docs, toks,
      |    sum(toks) OVER (ORDER BY n_chars DESC) AS cum_toks,
      |    sum(toks) OVER () AS all_toks
      |  FROM per)
      |SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs_kept,
      |  CAST(sum(toks) AS BIGINT) AS tokens_kept,
      |  CAST(min(n_chars) AS BIGINT) AS cutoff_n_chars
      |FROM cum WHERE cum_toks <= all_toks * 0.25""".stripMargin) { (s, dir) =>
    val per = docs(s, dir)
      .groupBy("n_chars")
      .agg(count(lit(1)).as("n_docs"),
        sum(floor((col("n_chars") + 3) / 4).cast("long")).as("toks"))
    // cumulative-from-longest as a broadcast θ-self-join over the bucket
    // aggregates (cum_toks(b) = Σ toks of buckets ≥ b) instead of a
    // partition-less window: same result on the distinct bucket keys, but
    // no single-partition WindowExec — the buckets frame is tiny
    // (hundreds of rows) while the join stays parallel
    val buckets = per.select(col("n_chars").as("nc2"), col("toks").as("toks2"))
    val totals = per.agg(sum("toks").as("all_toks"))
    val cum = per
      .join(broadcast(buckets), col("nc2") >= col("n_chars"))
      .groupBy("n_chars", "n_docs", "toks")
      .agg(sum("toks2").as("cum_toks"))
      .crossJoin(broadcast(totals))
    cum.filter(col("cum_toks") <= col("all_toks") * 0.25)
      .agg(sum("n_docs").cast("long").as("n_docs_kept"),
        sum("toks").cast("long").as("tokens_kept"),
        min("n_chars").cast("long").as("cutoff_n_chars"))
  }

  /** Sliding-window document chunking: fixed-size token windows with
    * overlap (size 64, stride 48 → 16-token overlap), the standard
    * long-document preprocessing step before sequence packing. Pure
    * per-row explode — chunk boundaries are a function of the row alone,
    * so the operator is shuffle-free and re-shard-stable at any scale.
    * The oracle replays the same windows with DuckDB list slicing; token
    * arithmetic is all integers. */
  /** Shared chunk computation (also the base of [[pack]]). */
  private def chunkDf(s: SparkSession, dir: String): DataFrame = {
    val size = 64
    val stride = 48
    val toks = org.apache.spark.sql.functions.split(col("text"), " ")
    docs(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1),
          greatest(org.apache.spark.sql.functions.size(col("toks")), lit(1)),
          lit(stride))).as("start"))
      .select(col("doc_id"),
        (((col("start") - 1) / stride).cast("long")).as("chunk_idx"),
        least(lit(size),
          org.apache.spark.sql.functions.size(col("toks"))
            - col("start") + 1).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(size)))
          .as("chunk_text"))
  }

  /** The chunk CTE as portable SQL (shared by both oracles). */
  private val chunkSql =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |     s AS (SELECT doc_id, toks,
      |             unnest(generate_series(1, greatest(len(toks), 1), 48))
      |               AS start
      |           FROM t),
      |     chunks AS (
      |       SELECT doc_id,
      |         CAST((start - 1) / 48 AS BIGINT) AS chunk_idx,
      |         CAST(least(64, len(toks) - start + 1) AS BIGINT) AS n_tokens,
      |         array_to_string(toks[start:start+63], ' ') AS chunk_text
      |       FROM s)""".stripMargin

  val chunk = Q(
    "curate_chunk",
    s"""WITH $chunkSql
      |SELECT doc_id, chunk_idx, n_tokens, chunk_text FROM chunks
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    chunkDf(s, dir).orderBy("doc_id", "chunk_idx")
  }

  /** Greedy sequence packing: chunks are laid end-to-end per hash shard in
    * (doc_id, chunk_idx) order and cut into 2048-token packs — the step
    * that turns chunked documents into fixed-length training sequences.
    * Packing is PER SHARD (16 md5 shards), which is both what makes it
    * scale (each shard's running sum is an independent keyed window — no
    * global cumulative bottleneck) and what real per-worker packing does.
    * Reported per pack: chunk count, token count, distinct docs. All
    * integer arithmetic over a deterministic order. */
  val pack = Q(
    "curate_pack",
    s"""WITH $chunkSql,
      |     sharded AS (
      |       SELECT CAST(CAST(concat('0x',
      |                substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
      |                % 16 AS BIGINT) AS shard,
      |              doc_id, chunk_idx, n_tokens
      |       FROM chunks),
      |     cum AS (
      |       SELECT shard, doc_id, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY shard
      |           ORDER BY doc_id, chunk_idx
      |           ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
      |       FROM sharded)
      |SELECT shard * 100000 + CAST(start_tok // 2048 AS BIGINT) AS pack_id,
      |  CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM cum GROUP BY 1 ORDER BY pack_id""".stripMargin) { (s, dir) =>
    val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 4),
      16, 10).cast("long") % 16).as("shard")
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkDf(s, dir)
      .select(shard, col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .withColumn("start_tok",
        sum("n_tokens").over(w) - col("n_tokens"))
      .groupBy((col("shard") * 100000 +
        floor(col("start_tok") / 2048)).as("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("n_tokens"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy("pack_id")
  }

  /** Target-proportion source mixing — the data-dependent half of a mixing
    * recipe ([[hashSample]] is the fixed-rate half): derive each source's
    * acceptance rate FROM observed counts so the kept corpus approaches
    * EQUAL shares per source (the uniform recipe; any weight vector slots
    * into the same shape), then keep each doc iff hash16(doc_id) < rate.
    * Sources already at/below their target share keep everything
    * (rate = 65536); over-represented sources are down-sampled toward
    * total/n_sources docs.
    *
    * 100 TB shape: the rate table is one row per SOURCE (tiny) — computed
    * with one count aggregation and windowed totals over that tiny table,
    * then broadcast-joined onto the corpus for a narrow per-row filter. No
    * shuffle touches full rows except the final per-source count. Integer
    * arithmetic throughout (rate = 65536·total ÷ (n_sources·count_s),
    * floor division) so Spark and DuckDB agree bit-for-bit. */
  val mix = Q(
    "curate_mix",
    """WITH counts AS (
      |  SELECT source, count(*) AS cnt FROM documents GROUP BY source),
      |rates AS (
      |  SELECT source, cnt,
      |    CAST(least(65536,
      |      (65536 * sum(cnt) OVER ()) // (count(*) OVER () * cnt))
      |      AS BIGINT) AS rate16
      |  FROM counts)
      |SELECT d.source, r.rate16,
      |  CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
      |FROM documents d JOIN rates r ON d.source = r.source
      |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
      |    AS INT) < r.rate16
      |GROUP BY d.source, r.rate16""".stripMargin) { (s, dir) =>
    val counts = docs(s, dir).groupBy("source")
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("total"), count(lit(1)).as("nsrc"))
    // integer `div`, not `/`: long `/` is double division in Spark, and at
    // corpus scale 65536·total can exceed a double's 2^53 exact range
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("source"),
        least(lit(65536L),
          expr("(65536 * total) div (nsrc * cnt)")).as("rate16"))
    docs(s, dir)
      .join(broadcast(rates), "source")
      .filter(hash16 < col("rate16"))
      .groupBy("source", "rate16")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").cast("long").as("chars_kept"))
  }

  /** Temperature-scaled source mixing (the multilingual/data-mixing
    * rebalancing recipe — sample shares ∝ countᵅ with α = 1/2, the
    * square-root temperature of Lample & Conneau 2019 / mT5): instead of
    * equal shares ([[mix]]), each source's target share is proportional
    * to √count, shrinking the gap between head and tail sources without
    * flattening it. Keep rate rₛ ∝ √cntₛ / cntₛ, normalized so the
    * largest rate is exactly 65536 (the most over-sampled-relative-to-
    * target source anchors the scale and keeps everything it can).
    *
    * Exactness across engines: √ is a correctly-rounded IEEE operation,
    * so `floor(sqrt(exact integer))` agrees bit-for-bit between Spark
    * and DuckDB; everything after it is integer multiply/divide. Same
    * 100 TB shape as [[mix]] — a per-source rate table broadcast onto a
    * narrow per-row hash filter. */
  val mixTemp = Q(
    "curate_mix_temp",
    """WITH counts AS (
      |  SELECT source, count(*) AS cnt FROM documents GROUP BY source),
      |ratios AS (
      |  SELECT source, cnt,
      |    (CAST(floor(sqrt(cnt)) AS BIGINT) * 65536) // cnt AS ratio
      |  FROM counts),
      |rates AS (
      |  SELECT source,
      |    CAST((65536 * ratio) // (max(ratio) OVER ()) AS BIGINT) AS rate16
      |  FROM ratios)
      |SELECT d.source, r.rate16,
      |  CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
      |FROM documents d JOIN rates r ON d.source = r.source
      |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
      |    AS INT) < r.rate16
      |GROUP BY d.source, r.rate16""".stripMargin) { (s, dir) =>
    val counts = docs(s, dir).groupBy("source")
      .agg(count(lit(1)).as("cnt"))
    val ratios = counts.select(col("source"), col("cnt"),
      expr("(CAST(floor(sqrt(cnt)) AS BIGINT) * 65536) div cnt").as("ratio"))
    val maxR = ratios.agg(max("ratio").as("max_ratio"))
    val rates = ratios.crossJoin(broadcast(maxR))
      .select(col("source"),
        expr("(65536 * ratio) div max_ratio").as("rate16"))
    docs(s, dir)
      .join(broadcast(rates), "source")
      .filter(hash16 < col("rate16"))
      .groupBy("source", "rate16")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").cast("long").as("chars_kept"))
  }

  /** Per-source quota capping (the RefinedWeb/CCNet "per-domain cap"
    * recipe: no single domain may dominate the corpus). Rank docs inside
    * each source by a deterministic hash — NOT by arrival order, so the
    * kept subset is a stable uniform sample of the domain, invariant to
    * re-shards — and keep the first 10
    * (the sf0.01 corpus has 25 docs per source, so the cap demonstrably
    * truncates). The window partitions by source,
    * so at 100 TB this is one hash-partition exchange keyed on the
    * (bounded-cardinality) domain column; a skewed mega-domain still
    * funnels into one task, which is exactly the hot-bucket shape the cap
    * itself then truncates at k rows. */
  val domainCap = Q(
    "curate_domain_cap",
    """SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source, row_number() OVER (
      |      PARTITION BY source
      |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
      |        1, 4)) AS INT), doc_id) AS rk
      |  FROM documents) t
      |WHERE rk <= 10""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("source").orderBy(hash16.asc, col("doc_id").asc)
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 10)
  }

  /** Deterministic seeded global shuffle for training order: every doc
    * gets a shuffle key md5(seed || doc_id), a shard (key mod 64), and a
    * position within its shard. This is the canonical distributed-shuffle
    * shape — ONE hash-partition exchange on shard + a per-shard local
    * sort; no global ordering step, because a training reader consumes
    * shard files independently. Same seed → same order on any engine,
    * partitioning, or rerun. */
  val shuffle = Q(
    "curate_shuffle",
    """SELECT doc_id, shard, row_number() OVER (
      |    PARTITION BY shard ORDER BY h, doc_id) AS pos
      |FROM (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5('shuf42:' ||
      |      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
      |    CAST(concat('0x', substr(md5('shuf42:' ||
      |      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS shard
      |  FROM documents) t""".stripMargin) { (s, dir) =>
    val h = conv(substring(md5(concat(lit("shuf42:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val keyed = docs(s, dir)
      .select(col("doc_id"), h.as("h"), (h % 64).as("shard"))
    keyed.select(col("doc_id"), col("shard"),
      row_number().over(
        Window.partitionBy("shard").orderBy(col("h").asc, col("doc_id").asc))
        .cast("long").as("pos"))
  }

  def all: Seq[Q] =
    Seq(hashSample, split, tokenBudget, chunk, pack, mix, mixTemp,
      domainCap, shuffle)
}
