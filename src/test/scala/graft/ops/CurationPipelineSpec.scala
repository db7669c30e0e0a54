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
