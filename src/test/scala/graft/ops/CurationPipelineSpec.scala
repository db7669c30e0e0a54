package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.spark.SparkSpec

/** The end-to-end pipeline: stage-count consistency, per-stage table
  * contracts, and bit-identical re-runs (every stage is deterministic).
  */
class CurationPipelineSpec extends SparkSpec {

  private lazy val out1 = Files.createTempDirectory("graft-pipe1").toString
  private lazy val manifest1 = CurationPipeline.run(spark, sf001, out1).toMap

  test("stage counts are consistent end-to-end") {
    val m = manifest1
    assert(m("documents") > 0)
    assert(m("dedup_verdicts") == m("documents"),
      "every doc gets a dedup verdict")
    assert(m("funnel_status") == m("documents"),
      "every doc gets a funnel status")
    assert(m("kept") > 0 && m("kept") < m("documents"),
      s"the funnel should keep a strict subset at sf0.001, kept=${m("kept")}")
    assert(m("clean_text") == m("kept"),
      "redact + line-strip are per-doc: no rows lost or invented")
    assert(m("shards") == m("clean_text"), "export writes every clean row")
    assert(m("packed") == m("clean_text"), "packing emits one row per doc")
    assert(m("train_order") == m("clean_text"), "every clean doc gets an order position")
    assert(m("sequences") > 0 && m("sequences") < m("clean_text"),
      s"sequence count ${m("sequences")} implausible for 1024-token packing")
  }

  test("training artifacts are mutually consistent") {
    // token conservation: the packed index, the materialized sequences,
    // and the clean text all describe the same token stream
    val packed = spark.read.parquet(s"$out1/packed")
    val seqs = spark.read.parquet(s"$out1/sequences")
    val totalPacked = packed.agg(sum(col("n_tokens"))).head().getLong(0)
    val totalSeq = seqs.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(totalPacked == totalSeq, "packing index and sequences disagree on token count")
    val last = seqs.agg(max(col("seq_id"))).head().getLong(0)
    assert(seqs.filter(col("seq_id") =!= last && col("n_tokens") =!= Packing.DefaultSeqLen)
      .count() == 0, "a non-final sequence is not full")
    // the order table is an exact permutation of the clean docs
    val order = spark.read.parquet(s"$out1/train_order")
    val n = order.count()
    val r = order.agg(min(col("position")), max(col("position")),
      countDistinct(col("position"))).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == n - 1 && r.getLong(2) == n,
      s"train_order is not a 0..${n - 1} permutation: $r")
  }

  test("stage tables honor their contracts") {
    val clean = spark.read.parquet(s"$out1/clean_text")
    assert(clean.filter(col("n_lines_kept") > col("n_lines_in")).count() == 0)
    assert(clean.filter(col("n_lines_in") <= 0).count() == 0)
    // the corpus is PII-free and the pipeline plants nothing: scrub
    // counters must all be zero while the columns still flow through
    assert(clean.filter(col("n_email") + col("n_ip") + col("n_phone") =!= 0).count() == 0)
    val packed = spark.read.parquet(s"$out1/packed")
    assert(packed.filter(col("seq_id") < 0).count() == 0)
    val shards = spark.read.parquet(s"$out1/shards")
    assert(shards.select("shard").distinct().count() > 1)
    assert(shards.filter(col("shard") < 0 || col("shard") >= Export.DefaultShards).count() == 0)
    // manifest.json exists and parses to the same counts
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out1, "manifest.json")), "UTF-8")
    assert(json.contains(s""""clean_text":${manifest1("clean_text")}"""))
  }

  test("a re-run is bit-identical: same manifest, same clean rows") {
    val out2 = Files.createTempDirectory("graft-pipe2").toString
    val manifest2 = CurationPipeline.run(spark, sf001, out2).toMap
    assert(manifest2 == manifest1)
    def rows(dir: String) = spark.read.parquet(s"$dir/clean_text")
      .select("doc_id", "text", "n_lines_in", "n_lines_kept")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(out2) == rows(out1))
  }
}
