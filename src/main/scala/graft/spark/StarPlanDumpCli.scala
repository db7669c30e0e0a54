package graft.spark

import org.apache.spark.sql.SparkSession

/** r07 evidence helper: print the executed-plan shape of one
  * large-star / small-star round (the per-iteration kernel of
  * t26/t28/t29). The star rounds run behind [[graft.ops.Staging]]
  * materialization, so the driver-level `explain` of the t26 query never
  * shows them — this dumps them directly for plans/r07/.
  *
  *   StarPlanDumpCli <outDir>
  */
object StarPlanDumpCli {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(0, 1000)
      .selectExpr("id AS src", "pmod(id * 37, 1000) AS dst")
      .selectExpr("least(src, dst) AS lo", "greatest(src, dst) AS hi")
      .where("lo != hi")
    new java.io.File(outDir).mkdirs()
    for ((name, df) <- Seq(
        "largeStar" -> graft.ops.Components.largeStar(edges),
        "smallStar" -> graft.ops.Components.smallStar(edges))) {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), p)
    }
    spark.stop()
  }
}
