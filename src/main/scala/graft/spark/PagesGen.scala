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

  /** A generic article page exercising the scoring/strip surface. */
  def articleHtml(docId: Long, text: String, replica: Int): String = {
    // deterministic "skew" slice: every 97th doc gets a 40x body on replica 0
    val body0 = paragraphs(text)
    val body = if (docId % 97 == 13 && replica == 0) body0 * 40 else body0
    val title = s"Synthetic Article $docId: " + text.split("\\s+").take(6).mkString(" ")
    s"""<!DOCTYPE html>
<html>
<head>
<title>$title</title>
<meta charset="utf-8">
<script src="http://cdn.corpus.test/app.js"></script>
<style>.x{color:red}</style>
</head>
<body>
<div class="header"><a href="/">corpus.test</a>
<ul class="navigation"><li><a href="/news">News</a></li><li><a href="/about">About</a></li></ul>
</div>
<div class="sidebar"><p>Trending now on corpus.test, subscribe for more updates and offers.</p></div>
<div class="storybody">
<h1>$title</h1>
$body
<img src="/img/doc$docId.jpg" width="640" height="480" alt="illustrative figure for synthetic article $docId with a caption long enough to score">
</div>
<div class="share-tools"><a href="http://twitter.com/share?u=doc$docId">tweet</a><a href="http://www.facebook.com/sharer.php?u=doc$docId">like</a></div>
<h4>Related stories</h4>
<ul><li><a href="/articles/doc${docId + 1}.html">next</a></li><li><a href="/articles/doc${docId + 2}.html">later</a></li><li><a href="/articles/doc${docId + 3}.html">more</a></li></ul>
<div class="comment-section"><p>first comment!</p><p>second comment, much disagreement here.</p></div>
<div class="footer"><p>copyright corpus.test</p></div>
</body>
</html>
"""
  }

  private def paragraphs(text: String): String = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) "<p>empty document body placeholder text</p>\n"
    else
      words
        .grouped(25)
        .map(g => s"<p>${g.mkString(" ")}.</p>")
        .mkString("\n") + "\n"
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
