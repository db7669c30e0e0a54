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
    */
  def sequencePackOn(df: DataFrame, seqLen: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    // materialized so BOTH passes see the exact same partitions — the
    // offsets are keyed by partition id, and re-running the range
    // sampler between passes must not be able to move a row. Default:
    // range-partition then localCheckpoint (pins the partitions
    // executor-locally). Staging mode (`graft.staging.dir`, r05 task 4):
    // persist the INPUT relation first, then range-partition the
    // read-back WITHOUT a checkpoint — the single RDD value below holds
    // one ShuffleDependency, so both passes reuse the same map outputs
    // (the range sampler runs once per RDD instance), and the durable
    // parquet input makes any recompute deterministic. Staging is
    // applied before the range shuffle, not after, because a parquet
    // read-back re-packs files into splits by size (FilePartition
    // bin-packing), which would NOT preserve the range-partition
    // boundaries the offset math keys on.
    val base = df.select(col("doc_id"), col("n_tokens"))
    val ranged = {
      val src =
        if (Staging.enabled(df)) Staging.materialize(base, "t22_pack_input")
        else base
      val r = src.repartitionByRange(parts, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .as[(Long, Long)]
      if (Staging.enabled(df)) r else r.localCheckpoint()
    }
    // phase 1+2: per-partition totals (P rows) to the driver. NB the
    // partition id must come from mapPartitionsWithIndex, NOT
    // TaskContext.getPartitionId(): the latter is the TASK's id, and a
    // downstream narrow coalesce (e.g. Verify's coalesce(1) before the
    // write) runs many RDD partitions inside one task — every partition
    // would read offset[0] and the prefix sums would reset at each
    // partition boundary (caught by the sf0.01 oracle).
    val rangedRdd = ranged.rdd
    val totals = rangedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        var n = 0L
        it.foreach { case (_, t) => sum += t; n += 1 }
        if (n == 0) Iterator.empty else Iterator((pid, sum))
      }
      .collect().toMap
    // phase 3: exclusive prefix offsets, broadcast into a second pass
    val maxPid = if (totals.isEmpty) -1 else totals.keys.max
    val offsets = new Array[Long](maxPid + 2)
    for (p <- 0 to maxPid)
      offsets(p + 1) = offsets(p) + totals.getOrElse(p, 0L)
    val bc = spark.sparkContext.broadcast(offsets)
    spark.createDataFrame(
      rangedRdd.mapPartitionsWithIndex { (pid, it) =>
        var cum = bc.value(math.min(pid, bc.value.length - 1))
        it.map { case (id, t) =>
          val before = cum
          cum += t
          (id, t, before)
        }
      })
      .toDF("doc_id", "n_tokens", "cum_before")
      .selectExpr("doc_id", "n_tokens", "cum_before",
        s"cum_before div $seqLen AS seq_id",
        s"cum_before % $seqLen AS seq_offset")
  }

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
