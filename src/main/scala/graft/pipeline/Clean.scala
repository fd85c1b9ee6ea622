package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the C4 rule family (Raffel et
  * al. 2020 §2.2: drop any line occurring ≥ 3 times in the corpus; also
  * the RefinedWeb "line-wise dedup" stage). The synthetic documents have
  * no newline structure, so a "line" here is a fixed 8-word segment; the
  * operator shape is identical for real newline-split lines.
  *
  * Scale posture: segments shuffle once for the global frequency count
  * (segment text is short and hashes well), the kept-segment join is an
  * equi-join on the segment itself, and reassembly is one groupBy(doc_id)
  * whose per-group state is bounded by the document's own segment count.
  * Nothing is corpus-sized on any single node; no all-pairs anywhere. */
object Clean {

  private val sharedOracle =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w,
      |    unnest(range(0, CAST(ceil(len(w) / 8.0) AS INT))) AS c
      |  FROM docs),
      |segs AS (
      |  SELECT doc_id, c,
      |    array_to_string(w[c * 8 + 1 : c * 8 + 8], ' ') AS seg
      |  FROM idx),
      |freq AS (SELECT seg, count(*) AS f FROM segs GROUP BY seg),
      |kept AS (
      |  SELECT doc_id, c, seg FROM segs JOIN freq USING (seg) WHERE f < 3)
      |SELECT doc_id,
      |  string_agg(seg, ' ' ORDER BY c) AS cleaned,
      |  count(*) AS n_kept
      |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Remove every 8-word segment that appears ≥ 3 times anywhere in the
    * corpus, then reassemble each document from its surviving segments in
    * original order. Documents whose every segment is boilerplate drop
    * out entirely (inner join) — the C4 behavior. */
  val boilerplate = Q("clean_boilerplate", sharedOracle) { (s, dir) =>
    Tables.register(s, dir)
    s.sql(
      """WITH docs AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        |segs AS (
        |  SELECT doc_id, pos AS c, seg
        |  FROM docs
        |  LATERAL VIEW posexplode(
        |    transform(sequence(0, CAST(ceil(size(w) / 8.0) AS INT) - 1),
        |      i -> array_join(slice(w, i * 8 + 1, 8), ' '))) AS pos, seg),
        |freq AS (SELECT seg, count(*) AS f FROM segs GROUP BY seg),
        |kept AS (
        |  SELECT doc_id, c, seg FROM segs JOIN freq USING (seg) WHERE f < 3)
        |SELECT doc_id,
        |  array_join(
        |    transform(array_sort(collect_list(struct(c, seg))), x -> x.seg),
        |    ' ') AS cleaned,
        |  count(*) AS n_kept
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  val all: Seq[Q] = Seq(boilerplate)
}
