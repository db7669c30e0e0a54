package graft.spark

import org.apache.spark.sql.SparkSession

/** spark-submit surface for the extraction pipeline.
  *
  *   ExtractJobCli <sfDir> <outDir> <runId> <buckets> [failAfterPids] [cores]
  *
  * Synthesizes the pages table from <sfDir>/documents.parquet (PagesGen),
  * runs the checkpointed extraction into <outDir>/{extracted,lineage}, and
  * prints coverage counters. `failAfterPids` (default: all) simulates a
  * killed job for resume drills: only the first K uncommitted buckets are
  * processed and committed.
  */
object ExtractJobCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val runId = args(2)
    val buckets = args(3).toInt
    val failAfterPids = if (args.length > 4) args(4).toInt else Int.MaxValue
    val cores = if (args.length > 5) args(5) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = PagesGen.asDataFrame(spark, sfDir)
    val nPages = pages.count()
    ExtractJob.runToDir(spark, pages, outDir, runId, buckets,
      failAfterPids = failAfterPids)
    val ex = spark.read.parquet(s"$outDir/extracted")
    val li = spark.read.parquet(s"$outDir/lineage")
    println(s"RESULT input=$nPages extracted=${ex.count()} " +
      s"distinct_urls=${ex.select("url").distinct().count()} " +
      s"committed_pids=${li.select("partition_id").distinct().count()} " +
      s"lineage_rows=${li.count()}")
    spark.stop()
  }
}
