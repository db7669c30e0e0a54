package graft.spark

import org.apache.spark.sql.SparkSession

/** End-to-end curation drive surface (the companion to ExtractJobCli):
  *
  *   runMain graft.spark.CurationPipelineCli <sfDir> <outDir> [numShards]
  *
  * Runs documents → dedup verdicts → funnel → redact → line-strip →
  * pack → sharded export over persisted stage tables under <outDir> and
  * prints ONE `RESULT` line of per-stage row counts (also written as
  * <outDir>/manifest.json).
  */
object CurationPipelineCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val shards = if (args.length > 2) args(2).toInt else graft.ops.Export.DefaultShards
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-curation-pipeline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val manifest = graft.ops.CurationPipeline.run(
        spark, sfDir, outDir, numShards = shards)
      println("RESULT " + manifest.map { case (k, v) => s"$k=$v" }.mkString(" "))
    } finally spark.stop()
  }
}
