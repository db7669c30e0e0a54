package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Two-phase DISTRIBUTED PREFIX SUM over an ordered relation — the
  * shared engine under t22 (sequence packing: running token total in
  * doc_id order) and t32 (training order: global rank in shuffled-key
  * order). The naive plan — `sum(w) OVER (ORDER BY …)` — is a
  * single-partition Window: every row moves to ONE task, the definition
  * of a 100 TB scale-killer (Spark itself warns "No Partition Defined
  * for Window operation"). Instead:
  *
  *   1. range-partition by the order columns (each partition owns a
  *      contiguous key range, P partitions work independently);
  *   2. per-partition weight totals — P numbers — come to the driver
  *      (the one justified collect: its size is the partition count,
  *      not the row count);
  *   3. exclusive prefix offsets per partition broadcast back; each
  *      partition streams its rows once, adding its offset to a local
  *      running sum.
  *
  * The callers' PlanSpecs pin the absence of any Window operator; their
  * DuckDB mirrors ARE the naive window (single-process anyway) — same
  * answer, different execution shape.
  */
private[ops] object PrefixSum {

  /** Append `outCol` = exclusive running sum of `weightCol` (BIGINT) in
    * `(orderCols, ascending)` order. The input relation is materialized
    * so BOTH passes see the exact same partitions — the offsets are
    * keyed by partition id, and re-running the range sampler between
    * passes must not be able to move a row. Default: range-partition
    * then localCheckpoint (pins the partitions executor-locally).
    * Staging mode (`graft.staging.dir`, VERDICT r05 task 4): persist
    * the INPUT relation first, then range-partition the read-back
    * WITHOUT a checkpoint — the single RDD value below holds one
    * ShuffleDependency, so both passes reuse the same map outputs (the
    * range sampler runs once per RDD instance), and the durable parquet
    * input makes any recompute deterministic. Staging is applied before
    * the range shuffle, not after, because a parquet read-back re-packs
    * files into splits by size (FilePartition bin-packing), which would
    * NOT preserve the range-partition boundaries the offset math keys
    * on.
    */
  def runningTotal(df: DataFrame, orderCols: Seq[String], weightCol: String,
      outCol: String, stageLabel: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    val ranged = {
      val src =
        if (Staging.enabled(df)) Staging.materialize(df, stageLabel)
        else df
      val r = src.repartitionByRange(parts, orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.head, orderCols.tail: _*)
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
    val wIdx = ranged.schema.fieldIndex(weightCol)
    val totals = rangedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        var n = 0L
        it.foreach { r => sum += r.getLong(wIdx); n += 1 }
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
        it.map { r =>
          val before = cum
          cum += r.getLong(wIdx)
          Row.fromSeq(r.toSeq :+ before)
        }
      },
      ranged.schema.add(outCol, LongType, nullable = false))
  }
}
