package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t30 — EXACT-SUBSTRING duplication coverage (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022 §4.1): for every
  * document, how many of its tokens sit inside a verbatim [[W]]-token
  * window that occurs MORE THAN ONCE corpus-wide (including a second time
  * in the same document — the reference work dedups within-doc repeats
  * too). This is the signal their ExactSubstr dedup removes; here it is
  * reported per document (dup_windows, dup_span_tokens, dup_span_frac)
  * so the curation funnel can gate on it, which is how near-verbatim
  * syndication survives both exact-hash (t1: one changed byte defeats it)
  * and MinHash (t6: high-but-sub-threshold Jaccard) passes.
  *
  * Shape: tokens are [[TextOps.Toks]] VERBATIM (the one corpus token
  * stream); windows are the W-token slices at every start position.
  * Flagging is a single analytic `count() OVER (PARTITION BY win)` —
  * the textbook operator for "per-occurrence output that needs a
  * group-wide aggregate". That gives exactly ONE wide exchange keyed on
  * the window, carrying the (doc_id, pos, win) payload once; the
  * groupBy-count + probe-join alternative would shuffle the window keys
  * a SECOND time for the aggregate (map-side partial combine recovers
  * almost nothing in a low-dup-rate corpus, so that side is ≈ another
  * full window-key relation — a near-doubling of the dominant shuffle
  * at 100 TB). PlanSpec pins exactly one `hashpartitioning(win`
  * exchange, a Window operator, and no join on the window key. Only the
  * FLAGGED occurrences (a small fraction) shuffle once more by doc_id
  * for the coverage fold. Coverage needs no interval stack:
  * fixed-length sorted intervals telescope, so each flagged window
  * contributes `min(W, pos − prev_pos)` exactly.
  *
  * 100 TB posture: the window relation is the corpus token stream ×
  * ~(window bytes + 16) — the dominant shuffle, linear, shuffled
  * exactly once. In production the shuffle key is a 128-bit window
  * FINGERPRINT (16 B/row, computed per-row) rather than the window
  * text; the sandbox keys raw text only so the DuckDB mirror stays
  * byte-exact — the same tradeoff t24 documents for line keys. Skew: a
  * pathological window repeated 10⁹ times lands in one reduce
  * partition in EITHER shape (the probe join concentrates identically
  * pre-AQE); the analytic count is one streaming pass over that
  * partition with no list collected anywhere, and such mega-repeated
  * windows are precisely the boilerplate the t24 line pass removes
  * upstream of this operator in the curation funnel.
  */
object Substring {

  /** Window length in tokens. Lee et al. use 50 on BPE tokens; the
    * synthetic corpus runs ~56 tokens/doc (median), so 10 keeps multiple
    * windows per document AND a real flagged population at verify scale
    * (969 repeated keys at sf0.01).
    */
  val W = 10

  def substringDup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Dedup.docs(spark, sfDir)
    // tokenize ONCE: both the per-doc token count and the window
    // relation read the staged token arrays (the LangModel.fit
    // pattern) — tokenization is the CPU-dominant scan work, and two
    // independent subtrees would run it twice over the corpus
    val toks = Staging.materialize(
      docs.selectExpr("doc_id", s"${TextOps.Toks} AS tk"), "t30_toks")
    val nTok = toks.selectExpr(
      "doc_id", "CAST(size(tk) AS BIGINT) AS n_tokens")
    // (doc_id, pos, win): every W-token window, pos 1-based. The size
    // guard matters: Spark's sequence(1, stop) DESCENDS for stop < 1.
    val winRel = toks
      .where(s"size(tk) >= $W")
      .selectExpr(
        "doc_id",
        s"posexplode(transform(sequence(1, size(tk) - ${W - 1}), i -> array_join(slice(tk, i, $W), ' ')))")
      .selectExpr("doc_id", "CAST(pos + 1 AS BIGINT) AS pos", "col AS win")
    val flagged = winRel
      .withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("win")))
      .where(col("df") > 1)
    val cov = flagged
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("dup_windows"),
        sort_array(collect_list(col("pos"))).as("ps"))
      .selectExpr(
        "doc_id", "dup_windows",
        // Fixed-length intervals sorted by start telescope: each window
        // adds min(W, pos - prev). Seeding prev = pos0 - W makes the
        // first window contribute exactly W.
        s"""aggregate(ps,
           |  named_struct('cov', CAST(0 AS BIGINT), 'prev', ps[0] - CAST($W AS BIGINT)),
           |  (a, p) -> named_struct('cov', a.cov + least(CAST($W AS BIGINT), p - a.prev), 'prev', p),
           |  a -> a.cov) AS dup_span_tokens""".stripMargin.replace("\n", " "))
    nTok.join(cov, Seq("doc_id"), "left")
      .selectExpr(
        "doc_id", "n_tokens",
        "coalesce(dup_windows, CAST(0 AS BIGINT)) AS dup_windows",
        "coalesce(dup_span_tokens, CAST(0 AS BIGINT)) AS dup_span_tokens",
        "round(coalesce(dup_span_tokens, CAST(0 AS BIGINT)) / greatest(n_tokens, 1), 4) AS dup_span_frac")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t30_substring_dup" -> ((s, d) => substringDup(s, d))
  )

  val oracles: Map[String, String] = Map(
    // Same windows (TextOps' tokenizer fragment verbatim; DuckDB's
    // generate_series is empty for stop < start, so no size guard is
    // needed), same df > 1 flagging, and the coverage re-derived with a
    // LAG window instead of the fold — same telescoping identity,
    // different mechanism.
    "t30_substring_dup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${TextOps.dToks} AS tk FROM documents),
         |w AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(tk[i:i+${W - 1}], ' ') AS win
         |  FROM toks, UNNEST(generate_series(1, len(tk) - ${W - 1})) AS g(i)),
         |df AS (SELECT win FROM w GROUP BY win HAVING count(*) > 1),
         |fl AS (SELECT w.doc_id, w.pos FROM w JOIN df USING (win)),
         |fl2 AS (
         |  SELECT doc_id, pos,
         |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM fl),
         |cov AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows,
         |         CAST(sum(least($W, pos - coalesce(prev, pos - $W))) AS BIGINT) AS dup_span_tokens
         |  FROM fl2 GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |       coalesce(c.dup_windows, CAST(0 AS BIGINT)) AS dup_windows,
         |       coalesce(c.dup_span_tokens, CAST(0 AS BIGINT)) AS dup_span_tokens,
         |       round(coalesce(c.dup_span_tokens, CAST(0 AS BIGINT)) / greatest(len(t.tk), 1), 4) AS dup_span_frac
         |FROM toks t LEFT JOIN cov c USING (doc_id)""".stripMargin
  )
}
