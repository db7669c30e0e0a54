package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Reliable-materialization option for the pipeline's intermediate
  * relations (VERDICT r05 task 4).
  *
  * The dedup/packing operators must materialize small intermediate
  * relations that are referenced by several downstream branches
  * (signatures, survivors, candidate pairs) — both to avoid recomputing
  * the upstream stage per reference (Spark's ReuseExchange does not
  * deduplicate the subtrees) and to TRUNCATE the logical plan (the r05
  * t13 driver-side planning blowup). Two implementations:
  *
  *  - default: `localCheckpoint()` — cheap (executor-local blocks, no
  *    filesystem round-trip), right for a single-JVM sandbox, but NOT
  *    fault-tolerant: past the checkpoint there is no lineage to
  *    recompute, so on a real cluster one lost executor kills the job.
  *  - `graft.staging.dir` set: write-to-parquet + read-back under that
  *    directory — the staging-table shape a production run uses (the
  *    ICEBERG.md staging-table analogue): durable against executor loss,
  *    resumable, and inspectable. Same plan truncation, same semantics
  *    (DedupSpec/PackingSpec pin identical results under both modes).
  */
object Staging {

  /** Session conf: when set, intermediates persist to parquet under this
    * directory instead of localCheckpoint.
    */
  val ConfKey = "graft.staging.dir"

  private val counter = new AtomicLong(0L)

  /** Per-JVM token in every staging path: two drivers pointing at the
    * same durable staging root (the feature's stated production shape)
    * must never overwrite each other's tables — the in-JVM counter alone
    * restarts at 0 in every process.
    */
  private val jvmToken: String =
    java.util.UUID.randomUUID().toString.take(8)

  def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ConfKey).isDefined

  /** Materialize `df` once: parquet staging table when [[ConfKey]] is
    * set, localCheckpoint otherwise. `name` keys the staging subdirectory
    * (suffixed with a per-JVM token + counter so neither concurrent
    * processes nor repeated pipeline runs in one session collide).
    */
  def materialize(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(root) =>
        val path = s"$root/${name}_${jvmToken}_${counter.incrementAndGet()}"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None =>
        df.localCheckpoint()
    }
  }
}
