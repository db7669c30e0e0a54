package graft.spark

import java.util.concurrent.atomic.AtomicInteger

import graft.kernel.Clean

/** Spark-free kernel scaling calibration: run Clean.clean over an
  * in-memory corpus with plain JVM threads at several thread counts.
  * Separates kernel/JVM scaling (GC, allocation, memory bandwidth) from
  * Spark overheads and host CPU provisioning.
  *
  *   KernelScalingCli <sfDir> <repl> <threadCounts csv>
  */
object KernelScalingCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repl = args(1).toInt
    val counts = args(2).split(",").map(_.toInt)

    // build corpus without Spark: read documents via a minimal session once
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    spark.stop()
    val corpus: Array[(String, Array[Byte])] =
      docs.flatMap { case (id, text) =>
        (0 until repl).map(r => PagesGen.buildPage(id, text, r))
      }
    println(s"corpus=${corpus.length} docs, ${corpus.map(_._2.length.toLong).sum / 1024 / 1024} MiB")

    def leg(threads: Int): (Double, Int, Int) = {
      val idx = new AtomicInteger(0)
      val done = new AtomicInteger(0)
      val fails = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < corpus.length) {
            val (url, html) = corpus(i)
            try { Clean.clean(url, html); done.incrementAndGet() }
            catch {
              case e: Throwable =>
                fails.incrementAndGet()
                if (fails.get() <= 3)
                  println(s"FAIL $url: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(150)}")
            }
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      ((System.nanoTime() - t0) / 1e9, done.get(), fails.get())
    }

    leg(8) // warmup (JIT)
    counts.foreach { c =>
      val (t, ok, bad) = leg(c)
      println(f"THREADS $c%2d  ${t}%7.2f s  ${corpus.length / t}%9.1f docs/s  ${corpus.length / t / c}%8.1f docs/s/thread  ok=$ok fail=$bad")
    }
  }
}
