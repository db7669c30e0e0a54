package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profile of the extraction pipeline on a materialized
  * corpus: isolates scan, scan+shuffle, and full-pipeline cost so the
  * "Spark tax" over the raw kernel is attributable.
  *
  *   ProfileCli <corpusDir> [cores]
  */
object ProfileCli {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cores = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val buckets = 64

    def timed(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    val table = spark.read.parquet(corpusDir)
    timed("scan+length(html)") {
      table.select(sum(length(col("html")))).head(); table.count()
    }
    timed("scan+decode-bytes") { // forces full binary materialization
      table.select(xxhash64(col("html")).as("h")).agg(max(col("h"))).head()
      table.count()
    }
    timed("scan+pid+shuffle (no kernel)") {
      ExtractJob.withPid(table, buckets)
        .select("url", "html", "pid")
        .repartition(buckets, col("pid"))
        .agg(sum(length(col("html")))).head()
      table.count()
    }
    timed("full pipeline") {
      ExtractJob.extract(ExtractJob.withPid(table, buckets)).count()
    }
    spark.stop()
  }
}
