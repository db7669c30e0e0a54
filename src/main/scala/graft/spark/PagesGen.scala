package graft.spark

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic Common-Crawl-style page synthesizer.
  *
  * The sandbox has no real web corpus (TESTDATA.md), so `pages` rows are
  * synthesized from the driver's `documents` table: each document's text
  * becomes the main content of a generated article page wrapped in
  * realistic boilerplate (masthead nav, share bar, sidebar, related-links
  * list, comment section) that the scoring kernel must strip. Everything is
  * keyed off `doc_id` — same input always produces byte-identical pages, so
  * goldens are stable (FIXTURES.md §1).
  *
  * A slice of doc_ids is routed through the kernel's special paths
  * (SURVEY.md §2.2/§2.4): `.txt` passthrough, youtube/pdf/image templates,
  * and a degenerate empty page (the `'<p>Scoring error.'` path,
  * extract_content.py:95-100). `repl` > 1 replicates every document with a
  * url salt for bench-scale corpora; replica 0 of a skew slice gets its
  * body text repeated to emulate giant HTML blobs (skew handling, §4.2).
  */
object PagesGen {

  val BaseTs = 1767225600000L // 2026-01-01T00:00:00Z

  /** Pure page builder: (doc_id, text, replica) → (url, html). */
  def buildPage(docId: Long, text: String, replica: Int): (String, Array[Byte]) = {
    val salt = if (replica == 0) "" else s"r$replica/"
    val route = docId % 20
    route match {
      case 17 =>
        val url = s"http://corpus.test/${salt}doc$docId/notes.txt"
        (url, s"Plain text document $docId.\n$text\n".getBytes("UTF-8"))
      case 18 if replica == 0 =>
        // degenerate page: nothing scorable → "<p>Scoring error.</p>" golden
        val url = s"http://corpus.test/${salt}doc$docId/empty"
        (url, "<html><head></head><body></body></html>".getBytes("UTF-8"))
      case 19 =>
        val url = s"http://www.youtube.com/watch?v=v${docId}x&feature=t"
        // router short-circuits before parsing; body content is irrelevant
        (url, s"<html><body>player $docId</body></html>".getBytes("UTF-8"))
      case _ =>
        val url = s"http://corpus.test/${salt}articles/doc$docId.html"
        (url, articleHtml(docId, text, replica).getBytes("UTF-8"))
    }
  }

  // ---- deterministic filler-prose generator (no external data) ----------
  // Real Common-Crawl article pages average 30-100 KiB with boilerplate-
  // heavy DOMs; the round-1 ~1.3 KiB pages overstated kernel throughput
  // (VERDICT r01 "what's wrong" #4). Pages are now ~20-30 KiB: the doc's
  // own text plus seeded filler prose as main content, and realistically
  // deep boilerplate (nav farm, sidebar modules, comment thread, footer)
  // that the scoring kernel must strip. Everything derives from doc_id via
  // splitmix64 — byte-identical across runs and JVMs.

  private val Vocab: Array[String] = Array(
    "analysis", "report", "system", "market", "public", "research", "data",
    "policy", "development", "service", "industry", "network", "project",
    "community", "process", "technology", "information", "management",
    "government", "national", "economic", "program", "support", "evidence",
    "question", "problem", "approach", "practice", "history", "culture",
    "science", "education", "resource", "standard", "quality", "impact",
    "growth", "change", "result", "measure", "review", "detail", "context",
    "factor", "moment", "period", "region", "sector", "figure", "record",
    "the", "a", "this", "that", "with", "from", "over", "under", "between",
    "through", "against", "without", "toward", "around")

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic filler sentence stream keyed off (docId, stream, idx). */
  private def fillerWords(docId: Long, stream: Int, n: Int): String = {
    val sb = new StringBuilder(n * 8)
    var state = splitmix64(docId * 131L + stream)
    var i = 0
    var sentenceLeft = 9
    while (i < n) {
      state = splitmix64(state)
      val w = Vocab(((state >>> 16) % Vocab.length).toInt.abs)
      if (i > 0) sb.append(' ')
      sb.append(w)
      sentenceLeft -= 1
      if (sentenceLeft == 0 && i < n - 1) { sb.append('.'); sentenceLeft = 9 }
      i += 1
    }
    sb.append('.')
    sb.toString
  }

  /** A generic article page exercising the scoring/strip surface. */
  def articleHtml(docId: Long, text: String, replica: Int): String = {
    // deterministic "skew" slice: every 97th doc gets a 10x body on replica 0
    val body0 = paragraphs(docId, text)
    val body = if (docId % 97 == 13 && replica == 0) body0 * 10 else body0
    val title = s"Synthetic Article $docId: " + text.split("\\s+").take(6).mkString(" ")

    val nav = (0 until 36).map { i =>
      s"""<li><a href="/section$i/index.html">Section $i news and updates</a></li>"""
    }.mkString("\n")
    val sidebar = (0 until 8).map { i =>
      s"""<div class="module promo"><h5>Module $i</h5><p>${fillerWords(docId, 100 + i, 24)}</p>
<ul><li><a href="/promo/$i/a">${fillerWords(docId, 200 + i, 5)}</a></li><li><a href="/promo/$i/b">${fillerWords(docId, 300 + i, 5)}</a></li></ul></div>"""
    }.mkString("\n")
    val comments = (0 until 22).map { i =>
      s"""<div class="comment" id="comment-$i"><p class="comment-meta">user${(docId + i) % 997} says:</p><p>${fillerWords(docId, 400 + i, 28)}</p></div>"""
    }.mkString("\n")
    val related = (0 until 14).map { i =>
      s"""<li><a href="/articles/doc${docId + i + 1}.html">${fillerWords(docId, 500 + i, 7)}</a></li>"""
    }.mkString("\n")
    val footer = (0 until 18).map { i =>
      s"""<a href="/corporate/page$i.html">corporate link $i</a>"""
    }.mkString(" | ")

    s"""<!DOCTYPE html>
<html>
<head>
<title>$title</title>
<meta charset="utf-8">
<script src="http://cdn.corpus.test/app.js"></script>
<script>var trackingConfig = {"site": "corpus.test", "doc": $docId, "flags": [1,2,3,4,5,6,7,8]};</script>
<style>.x{color:red}.module{border:1px}.comment{margin:2px}</style>
</head>
<body>
<div class="header"><a href="/">corpus.test</a>
<ul class="navigation">
$nav
</ul>
</div>
<div class="sidebar">
<p>Trending now on corpus.test, subscribe for more updates and offers.</p>
$sidebar
</div>
<div class="storybody">
<h1>$title</h1>
$body
<img src="/img/doc$docId.jpg" width="640" height="480" alt="illustrative figure for synthetic article $docId with a caption long enough to score">
</div>
<div class="share-tools"><a href="http://twitter.com/share?u=doc$docId">tweet</a><a href="http://www.facebook.com/sharer.php?u=doc$docId">like</a></div>
<h4>Related stories</h4>
<ul>
$related
</ul>
<div class="comment-section">
<h3>Comments</h3>
$comments
</div>
<div class="footer"><p>copyright corpus.test</p><p class="footer-links">$footer</p></div>
</body>
</html>
"""
  }

  /** Main-content paragraphs: the document's own text followed by seeded
    * filler prose (same doc every time), ~500 words total.
    */
  private def paragraphs(docId: Long, text: String): String = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val own =
      if (words.isEmpty) "<p>empty document body placeholder text</p>\n"
      else
        words.grouped(25).map(g => s"<p>${g.mkString(" ")}.</p>").mkString("\n") + "\n"
    val filler = (0 until 8)
      .map(i => s"<p>${fillerWords(docId, i, 56)}</p>")
      .mkString("\n")
    own + filler + "\n"
  }

  /** Synthesize the `pages` Dataset from `<sfDir>/documents.parquet`. */
  def fromDocuments(spark: SparkSession, sfDir: String, repl: Int = 1): Dataset[Page] = {
    import spark.implicits._
    // documents.parquet is a single small file (= one input split); without
    // an explicit repartition the whole synthesis flatMap would run on one
    // task and serialize the corpus build regardless of core count.
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String, String)]
    docs.flatMap { case (docId, text, lang) =>
      (0 until repl).iterator.map { r =>
        val (url, html) = buildPage(docId, text, r)
        Page(url, new Timestamp(BaseTs + docId * 1000L + r), html, text, lang)
      }
    }
  }

  def asDataFrame(spark: SparkSession, sfDir: String, repl: Int = 1): DataFrame =
    fromDocuments(spark, sfDir, repl).toDF()
}
