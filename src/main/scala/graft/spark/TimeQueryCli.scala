package graft.spark

import org.apache.spark.sql.SparkSession

/** Micro-harness: time one SparkEntry query N times and print the plan.
  *
  *   TimeQueryCli <name> <sfDir> [reps] [cores] [explain]
  */
object TimeQueryCli {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3) else "32"
    val doExplain = args.length > 4 && args(4) == "explain"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_HASH_FAMILY=md5 times the Verify-mode hash family (A/B vs xx64)
    sys.env.get("GRAFT_HASH_FAMILY")
      .foreach(spark.conf.set(graft.ops.HashFamily.ConfKey, _))
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIME $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
