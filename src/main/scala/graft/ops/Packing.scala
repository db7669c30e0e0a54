package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t22 — SEQUENCE PACKING: map each document to its position in the
  * concat-and-chunk token stream of GPT-style pretraining (documents
  * concatenated in doc_id order, the stream cut into fixed-length
  * sequences). Emitted per doc: the global token offset where the doc
  * starts (`cum_before`), the training sequence its first token lands in
  * (`seq_id = cum_before div L`), and the offset inside that sequence —
  * everything a sharded tokenizer/packer needs to cut sequences without
  * ever materializing the concatenated stream.
  *
  * The interesting part is HOW the global running sum is computed.
  * The naive plan — `sum(n) OVER (ORDER BY doc_id)` — is a
  * single-partition Window: every row moves to ONE task, the definition
  * of a 100 TB scale-killer (Spark itself warns "No Partition Defined
  * for Window operation"). This operator instead does the classic
  * two-phase distributed prefix sum:
  *
  *   1. range-partition by doc_id (each partition owns a contiguous
  *      id range, P partitions work independently);
  *   2. per-partition token totals — P numbers — come to the driver
  *      (the one justified collect: its size is the partition count,
  *      not the row count);
  *   3. exclusive prefix offsets per partition broadcast back; each
  *      partition streams its rows once, adding its offset to a local
  *      running sum.
  *
  * PlanSpec pins the absence of any Window operator in the plan. The
  * DuckDB mirror IS the naive window (single-process anyway), which is
  * exactly the point: same answer, different execution shape.
  */
object Packing {

  val DefaultSeqLen = 1024L

  def sequencePack(spark: SparkSession, sfDir: String,
      seqLen: Long = DefaultSeqLen): DataFrame =
    sequencePackOn(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id", s"CAST(size(${TextOps.Toks}) AS BIGINT) AS n_tokens"),
      seqLen)

  /** `df` must carry (doc_id, n_tokens). Partition count scales with the
    * input (bounded below for parallelism, above by the driver collect).
    * The running total itself is [[PrefixSum.runningTotal]] — the shared
    * two-phase distributed prefix sum (partition pinning, staging mode,
    * and the narrow-coalesce partition-id subtlety are documented
    * there); this operator contributes the token weights and the
    * seq_id / seq_offset division.
    */
  def sequencePackOn(df: DataFrame, seqLen: Long): DataFrame =
    PrefixSum.runningTotal(
      df.select(col("doc_id"), col("n_tokens")),
      orderCols = Seq("doc_id"), weightCol = "n_tokens",
      outCol = "cum_before", stageLabel = "t22_pack_input")
      .selectExpr("doc_id", "n_tokens", "cum_before",
        s"cum_before div $seqLen AS seq_id",
        s"cum_before % $seqLen AS seq_offset")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t22_sequence_pack" -> ((s, d) => sequencePack(s, d))
  )

  val oracles: Map[String, String] = Map(
    // the single-process mirror is the naive running-sum window — same
    // answer as the two-phase distributed prefix sum, by construction
    "t22_sequence_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(regexp_split_to_array(text, ${Tokenize.DuckWs}), x -> x != '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, n_tokens, cum_before,
         |       cum_before // $DefaultSeqLen AS seq_id,
         |       cum_before % $DefaultSeqLen AS seq_offset
         |FROM c""".stripMargin
  )
}
