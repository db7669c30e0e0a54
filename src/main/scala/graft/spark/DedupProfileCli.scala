package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, HashFamily}

/** Stage-by-stage profile of the MinHash/Jaccard dedup family (the most
  * expensive non-kernel queries): isolates shingle explode, signature
  * aggregation, banding, and the candidate join, per hash family, so a
  * wall-time regression is attributable to a stage instead of guessed at
  * (VERDICT r04 "what's wrong" #1/#2).
  *
  *   DedupProfileCli <sfDir> [cores] [fam]
  */
object DedupProfileCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = if (args.length > 1) args(1) else "32"
    val fam = if (args.length > 2 && args(2) == "md5") HashFamily.Md5Mirror
              else HashFamily.Xx64
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Long): Unit = {
      f // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-24s best ${times.min}%6.2f s  med ${times.sorted.apply(1)}%6.2f s")
    }

    val docs = Dedup.docs(spark, sfDir).select("doc_id", "text")
    timed("scan")(docs.count())
    timed("tokens") {
      docs.selectExpr("doc_id",
        "size(filter(split(text, '\\\\s+'), x -> x != '')) AS n").agg(sum("n")).count()
    }
    val sh = Dedup.shingles(docs)
    timed("shingles")(sh.count())
    timed("base_hash") {
      sh.withColumn("base", fam.base31(col("shingle"))).agg(sum("base")).count()
    }
    timed("signatures")(Dedup.minhashSignatures(docs, fam).count())
    timed("t6_full")(Dedup.minhashLshOn(docs, th = 0.5, fam).count())
    locally {
      val q = Dedup.minhashLshOn(docs, th = 0.5, fam)
      q.count()
      val p = q.queryExecution.executedPlan.toString
      println(s"T6PLAN scans=${"Scan parquet|FileScan parquet".r.findAllIn(p).length} " +
        s"reused=${"ReusedExchange".r.findAllIn(p).length} " +
        s"exchanges=${"Exchange hashpartitioning".r.findAllIn(p).length} " +
        s"aqe=${"AdaptiveSparkPlan".r.findAllIn(p).length}")
    }
    // t6 sub-stage attribution: signature checkpoint vs banding/pair-gen
    // vs the sig-fetch joins (each stage includes its own planning cost,
    // as the bench harness pays it).
    locally {
      val t0 = System.nanoTime()
      val sig = Dedup.minhashSignatures(docs, fam).localCheckpoint()
      println(f"CKPT  t6_sig ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      timed("t6_pairs_only")(Dedup.lshCandidatePairs(sig, fam).count())
      timed("t6_from_sig") {
        val pairs = Dedup.lshCandidatePairs(sig, fam)
        pairs
          .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
          .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
          .selectExpr("id_a", "id_b",
            "round(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 64.0D, 4) AS est_jaccard")
          .filter(col("est_jaccard") >= 0.5).count()
      }
    }
    timed("t8_jaccard")(Dedup.ngramJaccardOnShingles(sh, th = 0.05).count())
    timed("t13_pipeline")(Dedup.dedupPipeline(spark, sfDir, fam = fam).count())

    // t13 sub-stage attribution — mirrors the ACTUAL dedupPipeline shape
    // (localCheckpoint materialization, pair-keyed verification)
    {
      val d = docs
      val groups = d.groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("keep_id"))
      val withKeeper = d.withColumn("h", sha2(col("text"), 256)).join(groups, "h")
      timed("p_exact")(withKeeper.count())
      val t0s = System.nanoTime()
      val survivors = withKeeper.filter(col("doc_id") === col("keep_id"))
        .select("doc_id", "text").localCheckpoint()
      println(f"CKPT  survivors ${(System.nanoTime() - t0s) / 1e9}%6.2f s")
      val t0c = System.nanoTime()
      // bare band-bucket candidates off the signature relation — the r05
      // dedupPipeline shape (no est-Jaccard pre-filter; ADVICE r05)
      val candidates = Dedup
        .lshCandidatePairs(Dedup.minhashSignatures(survivors, fam), fam)
        .localCheckpoint()
      println(f"CKPT  candidates ${(System.nanoTime() - t0c) / 1e9}%6.2f s")
      val candDocs = survivors.join(
        candidates.selectExpr("id_a AS doc_id")
          .union(candidates.selectExpr("id_b AS doc_id")).distinct(), Seq("doc_id"))
      timed("p_cand_docs")(candDocs.count())
      println(s"COUNT candidates=${candidates.count()} candDocs=${candDocs.count()} survivors=${survivors.count()}")
      timed("p_verify_pairs")(Dedup.jaccardForPairs(candidates, candDocs, th = 0.8).count())
      val verified = Dedup.jaccardForPairs(candidates, candDocs, th = 0.8)
      val nearRemoved = verified
        .select(greatest(col("id_a"), col("id_b")).as("doc_id"),
          least(col("id_a"), col("id_b")).as("dup_of"))
        .groupBy(col("doc_id")).agg(min(col("dup_of")).as("dup_of"))
      timed("p_assembly") {
        d.select("doc_id").join(nearRemoved, Seq("doc_id"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
