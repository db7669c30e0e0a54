package graft.kernel

/** One-off large fuzz campaign (not part of `sbt test` — run manually):
  *
  *   sbt "Test/runMain graft.kernel.FuzzCampaignCli 50000"
  *
  * Drives N seeded tag-soup documents through the full kernel asserting
  * no-throw + determinism + the parse→serialize fixpoint, reusing
  * FuzzSpec's generator atoms. Prints a summary line; non-zero exit on
  * any failure with the offending seed (reproducible).
  */
object FuzzCampaignCli {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val gen = new FuzzGen
    var maxLen = 0
    var fails = 0
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val html = gen.doc(i * 2654435761L, 20 + i % 400)
      maxLen = math.max(maxLen, html.length)
      val url = s"http://fuzz.example/$i"
      try {
        val a = Clean.clean(url, html.getBytes("UTF-8"))
        val b = Clean.clean(url, html.getBytes("UTF-8"))
        if (a != b) { println(s"NONDETERMINISTIC seed=$i"); fails += 1 }
        val s1 = HtmlParser.parse(html).serialized
        val s2 = HtmlParser.parse(s1).serialized
        if (s1 != s2) { println(s"NON-FIXPOINT seed=$i"); fails += 1 }
        // decode-path fuzz (r05): arbitrary byte streams through the full
        // charset cascade — BOM / UTF-8-validity / SJIS / EUC-JP / EUC-KR /
        // Big5 / GBK / cp1252 — must never throw and must be deterministic.
        val rb = gen.bytes(i * 0x9E3779B97F4A7C15L, 16 + i % 300)
        val d1 = Clean.decodeHtml(rb)
        val d2 = Clean.decodeHtml(rb)
        if (d1 != d2) { println(s"NONDETERMINISTIC-DECODE seed=$i"); fails += 1 }
      } catch {
        case e: Throwable =>
          println(s"THROW seed=$i: ${e.getClass.getName}: ${e.getMessage}")
          fails += 1
      }
      if (i % 10000 == 0) println(s"...$i/$n")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"FUZZ n=$n fails=$fails maxLen=$maxLen in $secs%.1f s")
    if (fails > 0) sys.exit(1)
  }
}

/** Generator shared with FuzzSpec (seeded xorshift over soup atoms). */
final class FuzzGen {
  private def xorshift(s0: Long): Iterator[Long] = new Iterator[Long] {
    private var s = if (s0 == 0) 0x9E3779B97F4A7C15L else s0
    def hasNext = true
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
  }

  val Atoms: Array[String] = Array(
    "<", ">", "</", "<!", "<!--", "-->", "<?", "/>", "\"", "'", "=",
    "&", "&amp;", "&#", "&#x", "&#1f4a9;", "&bogus;", "&lt", ";",
    "<div", "<p>", "</p>", "</div>", "<script>", "</script>", "<pre>",
    "</pre>", "<br>", "<img src=", "class=", "id=", "style=",
    "text ", "wörds ", "日本語", " ", "�", "\n", "\t", " ",
    "<a href='", "<table><tr><td>", "<![CDATA[", "]]>", "<<<", ">>>",
    "<b", "<-", "< p>", "<3>", "<p/>,", "<p =x>", "<p a=>", "<p 'q'>",
    "<!DOCTYPE html>", "&nbsp;", "<title>t</title>", "<ul><li>x</li></ul>",
    "<h1>header text goes here</h1>", "<noscript>", "</noscript>")

  /** Arbitrary bytes (full 0x00-0xFF range) for decode-cascade fuzzing. */
  def bytes(seed: Long, n: Int): Array[Byte] = {
    val it = xorshift(seed)
    Array.fill(n)((it.next() & 0xff).toByte)
  }

  def doc(seed: Long, atoms: Int): String = {
    val it = xorshift(seed)
    val sb = new StringBuilder
    var i = 0
    while (i < atoms) {
      sb.append(Atoms(((it.next() >>> 1) % Atoms.length).toInt))
      i += 1
    }
    sb.toString
  }
}
