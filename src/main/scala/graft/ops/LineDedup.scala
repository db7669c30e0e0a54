package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t24 — LINE-LEVEL DEDUPLICATION (the CCNet boilerplate pass): drop every
  * line whose occurrence count across the corpus exceeds a threshold —
  * navigation bars, cookie banners, "subscribe" footers — while keeping
  * each document's unique content intact and in order. This is the
  * paragraph-hash dedup of Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data" (LREC 2020) §3.2, and it is
  * distinct from the document-level dedup family (t1/t6/t13): it edits
  * INSIDE surviving documents.
  *
  * Pipeline shape (three narrow stages, two essential shuffles):
  *   1. line-forming: a per-row `transform`/`slice` projection (no
  *      explode-shuffle) turns each doc into `array<struct<pos,line>>`;
  *   2. frequency: explode → `groupBy(line).count()` — ONE wide shuffle
  *      with map-side partial aggregation, so a banner occurring 10^9
  *      times crosses the wire once per map task, not per occurrence;
  *   3. strip + reassemble: the frequent set (count > maxDf) is at most
  *      |corpus lines| / maxDf distinct values — broadcast it and
  *      LEFT-ANTI join the exploded lines map-side (no second wide
  *      shuffle of the corpus), then `groupBy(doc_id)` re-aggregates
  *      surviving lines sorted by original position.
  * At 100 TB the frequency stage would count 128-bit line fingerprints
  * instead of shipping line text (collision-odds ≪ 1 per corpus); here the
  * count keys the raw line so the DuckDB oracle is byte-exact. PlanSpec
  * pins the broadcast anti-join and the absence of any cartesian.
  *
  * The synthetic corpus has no newlines, so the driver query FORMS lines
  * deterministically (8-word chunks) and plants boilerplate mirrored
  * verbatim in the oracle: a header+footer on every doc (df = |docs| →
  * stripped) and a promo line on every 50th doc (df = 10 at sf0.01 —
  * exactly the keep/strip boundary, pinning `> maxDf` vs `>= maxDf`).
  */
object LineDedup {

  val WordsPerLine = 8

  /** Lines with occurrence count > MaxDf are stripped. 10 at sf0.01 puts
    * the planted promo line exactly ON the boundary (kept).
    */
  val MaxDf = 10L

  val HeaderLine = "(c) corpus mirror all rights reserved"
  val PromoLine = "limited promo code for returning readers"
  val FooterLine = "subscribe to the newsletter for updates"

  /** text → array<struct<pos:long, line:string>> of WordsPerLine-word
    * chunks, pos starting at 1 (0 is reserved for the planted header).
    * Pure per-row HOFs — no shuffle, stays in whole-stage codegen.
    */
  private def chunkLines(text: Column): Column = {
    val ws = split(text, " ")
    val lastChunk = floor((size(ws) - lit(1)) / lit(WordsPerLine)).cast("int")
    transform(sequence(lit(0), lastChunk), i =>
      struct(
        (i + 1).cast("long").as("pos"),
        array_join(slice(ws, i * WordsPerLine + 1, lit(WordsPerLine)), " ").as("line")))
  }

  private def lineStruct(pos: Column, line: String): Column =
    struct(pos.cast("long").as("pos"), lit(line).as("line"))

  /** doc_id + text → doc_id + natural chunk `lines` (no planted
    * boilerplate) — the production entry point; the demo query's planting
    * lives in [[withPlantedLines]].
    */
  def chunked(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), chunkLines(col(textCol)).as("lines"))

  /** doc_id + text → doc_id + planted-and-chunked `lines`. Header at pos 0,
    * chunks at 1..m, promo (every 50th doc) at m+1, footer at m+2.
    */
  private[graft] def withPlantedLines(docs: DataFrame): DataFrame = {
    val chunks = chunkLines(col("text"))
    val m = size(chunks).cast("long")
    docs.select(
      col("doc_id"),
      concat(
        array(lineStruct(lit(0), HeaderLine)),
        chunks,
        when(col("doc_id") % 50 === 0, array(lineStruct(m + 1, PromoLine)))
          .otherwise(array().cast("array<struct<pos:bigint,line:string>>")),
        array(lineStruct(m + 2, FooterLine))).as("lines"))
  }

  /** The dedup proper, over (doc_id, lines: array<struct<pos,line>>).
    * Returns (doc_id, kept_text, n_lines_in, n_lines_kept); documents
    * whose every line was boilerplate survive with kept_text = ''.
    */
  def lineDedupOn(docs: DataFrame, maxDf: Long = MaxDf): DataFrame = {
    val lines = docs
      .select(col("doc_id"), explode(col("lines")).as("pl"))
      .select(col("doc_id"), col("pl.pos").as("pos"), col("pl.line").as("line"))
    val frequent = lines
      .groupBy("line").agg(count(lit(1)).as("line_count"))
      .filter(col("line_count") > maxDf)
      .select("line")
    val kept = lines.join(broadcast(frequent), Seq("line"), "left_anti")
    val reassembled = kept.groupBy("doc_id").agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          pl => pl.getField("line")),
        "\n").as("kept_text"),
      count(lit(1)).as("n_lines_kept"))
    docs
      .select(col("doc_id"), size(col("lines")).cast("long").as("n_lines_in"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        col("n_lines_in"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }

  def lineDedup(spark: SparkSession, sfDir: String): DataFrame =
    lineDedupOn(withPlantedLines(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t24_line_dedup" -> ((s, d) => lineDedup(s, d))
  )

  val oracles: Map[String, String] = Map(
    "t24_line_dedup" ->
      s"""WITH src AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |chunks AS (
         |  SELECT doc_id, g.i + 1 AS pos,
         |         array_to_string(ws[g.i*$WordsPerLine+1 : g.i*$WordsPerLine+$WordsPerLine], ' ') AS line
         |  FROM src, UNNEST(generate_series(0, (len(ws)-1)//$WordsPerLine)) AS g(i)),
         |mx AS (SELECT doc_id, count(*) AS m FROM chunks GROUP BY doc_id),
         |lines AS (
         |  SELECT * FROM chunks
         |  UNION ALL SELECT doc_id, 0, '$HeaderLine' FROM src
         |  UNION ALL SELECT doc_id, m + 1, '$PromoLine' FROM mx WHERE doc_id % 50 = 0
         |  UNION ALL SELECT doc_id, m + 2, '$FooterLine' FROM mx),
         |freq AS (SELECT line FROM lines GROUP BY line HAVING count(*) > $MaxDf),
         |kept AS (SELECT l.* FROM lines l LEFT JOIN freq f ON l.line = f.line
         |         WHERE f.line IS NULL),
         |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept_text,
         |               count(*) AS n_kept
         |        FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_in FROM lines GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(a.kept_text, '') AS kept_text,
         |       CAST(t.n_in AS BIGINT) AS n_lines_in,
         |       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_kept
         |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin
  )
}
