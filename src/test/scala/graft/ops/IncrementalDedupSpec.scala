package graft.ops

import org.apache.spark.sql.functions._

import graft.spark.SparkSpec

/** Two-batch incremental-ingest drill (VERDICT r05 task 8): turns the
  * "no corpus re-read per ingest" claim into a tested fact. Batch 1
  * (the standing corpus) persists its signature table; batch 2's ingest
  * probes the PERSISTED table — never recomputing corpus signatures —
  * and must produce exactly the pair set of the full recompute path.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
      r.getAs[Double]("est_jaccard"), r.getAs[String]("source"))).toSet

  test("batch-2 ingest against the persisted batch-1 signature table: equal pairs, no corpus re-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val d = Dedup.docs(spark, sf001).select("doc_id", "text")
    val corpus = d.filter(col("doc_id") % 4 =!= 0) // batch 1 = standing corpus
    val batch = d.filter(col("doc_id") % 4 === 0)  // batch 2 = new ingest

    // ingest 1 ran earlier: its signatures are ON DISK (the persisted
    // signature table ICEBERG.md maps; parquet stands in here)
    Dedup.minhashSignatures(corpus).write.parquet(s"$dir/corpus_sig")
    val persisted = spark.read.parquet(s"$dir/corpus_sig")

    // ingest 2: compute ONLY the batch signatures, probe the persisted table
    val batchSig = Dedup.minhashSignatures(batch).localCheckpoint()
    val ingest = Dedup.minhashIncrementalOnSigs(batchSig, persisted, th = 0.5)

    // the ingest plan touches the persisted signature table, never the
    // corpus text: no documents scan, no signature expression (the batch
    // side is materialized; the corpus side is a plain parquet scan)
    val p = ingest.queryExecution.executedPlan.toString
    assert(p.contains("corpus_sig"), "ingest does not scan the persisted signature table")
    assert(!p.contains("documents.parquet"),
      s"ingest re-reads the corpus text:\n${p.take(2000)}")
    assert(!p.contains("minhash_sig"),
      s"ingest recomputes signatures:\n${p.take(2000)}")

    // pair-set equality with the full recompute path
    assert(pairSet(ingest) == pairSet(Dedup.minhashIncremental(spark, sf001, th = 0.5)))
  }
}
