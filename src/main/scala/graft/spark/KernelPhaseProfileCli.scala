package graft.spark

import graft.kernel._

/** Phase-level kernel profile on the synthesized heavy corpus: attributes
  * per-document cost to parse / score+strip (Patterns.process) / select /
  * munge+hyphenate+serialize, so optimization effort goes where the time
  * is.
  *
  *   KernelPhaseProfileCli <sfDir> <repl> [iters]
  */
object KernelPhaseProfileCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repl = args(1).toInt
    val iters = if (args.length > 2) args(2).toInt else 3

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    spark.stop()
    val corpus: Array[(String, String)] = docs.flatMap { case (id, text) =>
      (0 until repl).map { r =>
        val (url, html) = PagesGen.buildPage(id, text, r)
        (url, new String(html, "UTF-8"))
      }
    }.filter(_._1.contains("/articles/")) // generic path only
    println(s"corpus=${corpus.length} article docs, ${corpus.map(_._2.length.toLong).sum / 1024 / 1024} MiB chars")

    def bench(name: String)(f: (String, String) => Any): Unit = {
      corpus.foreach { case (u, h) => f(u, h) } // warmup
      var best = Double.MaxValue
      (1 to iters).foreach { _ =>
        val t0 = System.nanoTime()
        corpus.foreach { case (u, h) => f(u, h) }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PHASE $name%-34s ${best}%7.2f s  ${corpus.length / best}%9.1f docs/s")
    }

    bench("parse only")((_, h) => HtmlParser.parse(Extract.preCleanHtml(h)))
    bench("parse+commentStrip+title") { (_, h) =>
      val soup = HtmlParser.parse(Extract.preCleanHtml(h))
      Extract.commentStrip(soup)
      soup.find("title")
    }
    bench("parse+Patterns.process") { (u, h) =>
      val soup = HtmlParser.parse(Extract.preCleanHtml(h))
      Extract.commentStrip(soup)
      Patterns.process(soup, u)
    }
    bench("extractFromHtml (thru select)")((u, h) => Extract.extractFromHtml(u, h))
    bench("extract+munge (full inner)") { (u, h) =>
      val r = Extract.extractFromHtml(u, h)
      Munge.munge(r.soup, r.selected, u)
    }
    val bytesCorpus = corpus.map { case (u, h) => (u, h.getBytes("UTF-8")) }
    locally {
      bytesCorpus.foreach { case (_, b) => Clean.decodeHtml(b) }
      var best = Double.MaxValue
      (1 to iters).foreach { _ =>
        val t0 = System.nanoTime()
        bytesCorpus.foreach { case (_, b) => Clean.decodeHtml(b) }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PHASE ${"decode bytes only"}%-34s ${best}%7.2f s  ${corpus.length / best}%9.1f docs/s")
    }
    locally { // hyphenation throughput over the corpus's word stream
      val words = corpus.flatMap(_._2.split("\\s+")).take(2000000)
      words.foreach(Hyphenate.hyphenateWord)
      var best = Double.MaxValue
      (1 to iters).foreach { _ =>
        val t0 = System.nanoTime()
        words.foreach(Hyphenate.hyphenateWord)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PHASE ${s"hyphenateWord x${words.length}"}%-34s ${best}%7.2f s  ${words.length / best / 1e6}%9.2f Mwords/s")
    }
    bench("full Clean.clean") { (u, h) =>
      Clean.clean(u, h.getBytes("UTF-8"))
    }
    bench("feed-note scan only")((u, h) => Clean.feedFallthroughNote(u, h))

    // Munge pass attribution: one full munge per doc with nanos accumulated
    // around each pass (fresh trees per doc; mutation makes per-pass
    // steady-state timing impossible otherwise).
    locally {
      val passNames = Array(
        "site", "brsAfterPs", "rules(hr)", "empties", "rootContainers",
        "lowScored", "stripAttrs", "fixUrls", "images", "headerDowngrade",
        "noscript", "serializeHyph(fused)")
      val acc = new Array[Long](passNames.length)
      corpus.foreach { case (u, h) => // warmup
        val r = Extract.extractFromHtml(u, h)
        Munge.munge(r.soup, r.selected, u)
      }
      corpus.foreach { case (u, h) =>
        val r = Extract.extractFromHtml(u, h)
        r.selected match {
          case Extract.SelNode(tag0: Elem) =>
            var tag = tag0
            var k = 0
            def step(f: => Unit): Unit = {
              val t0 = System.nanoTime(); f; acc(k) += System.nanoTime() - t0
              k += 1
            }
            step(Munge.mungeStripSiteSpecific(tag, u))
            step(Munge.mungeStripBrsAfterPs(tag))
            step(Munge.mungeStripRules(tag))
            step(Munge.mungeStripEmpties(tag))
            step { tag = Munge.mungeStripRootContainers(tag) }
            step(Munge.mungeStripLowScored(tag))
            step(Munge.mungeStripAttrs(tag))
            step(Munge.fixUrls(tag, u))
            step(Munge.mungeImages(tag))
            step(Munge.mungeHeaderDowngrade(tag))
            step(Munge.mungeNoscript(tag))
            step {
              val out = new StringBuilder(1 << 14)
              Munge.serializeHyphenated(tag, out)
              out.toString
            }
          case _ =>
        }
      }
      passNames.zip(acc).foreach { case (nm, ns) =>
        println(f"MUNGEPASS $nm%-18s ${ns / 1e9}%7.3f s")
      }
    }
  }
}
