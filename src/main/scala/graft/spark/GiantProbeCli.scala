package graft.spark

import graft.kernel.Clean

/** Isolates kernel cost vs document size: builds the PagesGen article at
  * 1x/5x/10x/20x/40x body replication and times Clean.clean on each.
  * Detects superlinear kernel passes (the giant-doc skew slice).
  */
object GiantProbeCli {
  def main(args: Array[String]): Unit = {
    val words = (1 to 80).map(i => s"word$i token$i").mkString(" ") // ~1KB text
    def page(mult: Int): (String, Array[Byte]) = {
      // mirror PagesGen.articleHtml's giant-doc construction
      val text = (1 to mult).map(_ => words).mkString(" ")
      PagesGen.buildPage(1013, text, 1) // generic route, no internal 40x
    }
    // warmup
    (1 to 3).foreach(_ => Clean.clean(page(1)._1, page(1)._2))
    for (mult <- Seq(1, 2, 5, 10, 20, 40)) {
      val (url, html) = page(mult)
      val t0 = System.nanoTime()
      val c = Clean.clean(url, html)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"MULT $mult%3d  html=${html.length}%8d B  out=${c.content.length}%8d  $ms%10.1f ms")
    }
  }
}
