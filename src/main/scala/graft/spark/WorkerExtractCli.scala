package graft.spark

import java.nio.file.{Files, Paths}

/** One simulated EXECUTOR for the multi-JVM scaling evidence (north rule:
  * N→4N executors): an independent JVM + SparkSession that extracts the
  * pid-slice `pid % numWorkers == workerIdx` of a materialized corpus —
  * exactly how hash partitioning divides work across executors on a real
  * cluster (disjoint slices, no coordination).
  *
  * Protocol (file barrier so all workers' timed windows align):
  *   1. build + warm the identical plan (executors are long-lived; JIT/
  *      codegen are not throughput),
  *   2. touch `<syncDir>/ready-<idx>`,
  *   3. poll for `<syncDir>/go`,
  *   4. run timed, print one line: `WORKER <idx> <docs> <secs>`.
  *
  *   WorkerExtractCli <corpusDir> <numWorkers> <workerIdx> <cores> <syncDir>
  */
object WorkerExtractCli {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, nw, idx, cores, syncDir) = args
    val numWorkers = nw.toInt
    val workerIdx = idx.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-worker-$workerIdx")
      .config("spark.sql.shuffle.partitions", math.max(cores.toInt, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val buckets = 64
    // the corpus is hive-partitioned by `wslice` (= pid % 4): a 4-worker
    // level prunes to its own directory slice — each executor scans ONLY
    // its input split, as on a real cluster (no redundant full-corpus
    // decompress per worker)
    val raw = spark.read.parquet(corpusDir)
    val sliced =
      if (numWorkers == 1) raw
      else {
        require(numWorkers == 4, "worker slicing is by wslice = pid % 4")
        raw.filter(col("wslice") === workerIdx)
      }
    val pages = ExtractJob.withPid(sliced.drop("wslice"), buckets)
    val plan = ExtractJob.extract(pages)
    plan.count() // warmup: identical plan

    Files.write(Paths.get(syncDir, s"ready-$workerIdx"), Array.emptyByteArray)
    val go = Paths.get(syncDir, "go")
    while (!Files.exists(go)) Thread.sleep(20)

    val t0 = System.nanoTime()
    val n = plan.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT: the f-interpolator is default-locale-dependent, and a
    // comma-decimal locale would break the harness's parts(3).toDouble
    println("WORKER %d %d %.3f".formatLocal(java.util.Locale.ROOT, workerIdx, n, secs))
    spark.stop()
  }
}
