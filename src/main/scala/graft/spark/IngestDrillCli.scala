package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measured evidence for the incremental-ingest story (VERDICT r05 task
  * 8): times one t17 ingest with the corpus signatures RECOMPUTED from
  * text (the sandbox driver-query shape) vs PROBED from a persisted
  * signature table (the production shape — the corpus text is never
  * re-read, re-shingled, or re-hashed per ingest). Prints both medians
  * and the delta for BENCH.md.
  *
  *   IngestDrillCli <sfDir> [cores]
  */
object IngestDrillCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val d = Dedup.docs(spark, sfDir).select("doc_id", "text")
    val corpus = d.filter(col("doc_id") % 4 =!= 0)
    val batch = d.filter(col("doc_id") % 4 === 0)
    Dedup.minhashSignatures(corpus).write.parquet(s"$dir/corpus_sig")

    def timed(name: String)(f: => Long): Double = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"DRILL $name%-20s med ${ts(1)}%6.2f s  (min ${ts.head}%5.2f max ${ts.last}%5.2f)")
      ts(1)
    }

    val recompute = timed("recompute_corpus") {
      Dedup.minhashIncremental(spark, sfDir, th = 0.5).count()
    }
    val persisted = timed("persisted_sig_table") {
      val corpusSig = spark.read.parquet(s"$dir/corpus_sig")
      val batchSig = Dedup.minhashSignatures(batch).localCheckpoint()
      Dedup.minhashIncrementalOnSigs(batchSig, corpusSig, th = 0.5).count()
    }
    println(f"DRILL delta: persisted is ${recompute / persisted}%.2fx faster " +
      f"(${recompute - persisted}%.2f s saved per ingest at this sf)")
    spark.stop()
  }
}
