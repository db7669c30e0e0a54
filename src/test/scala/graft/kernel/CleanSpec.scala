package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class CleanSpec extends AnyFunSuite {

  private def noShy(s: String): String = s.replace("­", "")

  private def clean(url: String, html: String): Clean.Cleaned =
    Clean.clean(url, html.getBytes(StandardCharsets.UTF_8))

  test("generic article end-to-end: highest-scored node wins") {
    val html =
      """<html><head><title>t</title></head><body>
        |<div class="nav">nav junk</div>
        |<div id="content"><p>""".stripMargin +
        ("Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 5) +
        "</p></div></body></html>"
    val r = clean("http://example.test/article", html)
    assert(r.error == null)
    assert(r.content.startsWith(
      "Content extracted from: <a href='http://example.test/article'>" +
        "http://example.test/article</a><hr>\n"))
    assert(noShy(r.content).contains("Lorem ipsum"))
    assert(!r.content.contains("nav junk")) // ATTR_STRIP word nav
  }

  test("url normalization: hashbang, fragment, utm, reddit host") {
    assert(Clean.normalizeUrl("http://x.test/a#!p=1") ==
      "http://x.test/a?_escaped_fragment_=p=1")
    assert(Clean.normalizeUrl("http://x.test/a#frag") == "http://x.test/a")
    assert(Clean.normalizeUrl("http://x.test/a?utm_source=rss&b=2") ==
      "http://x.test/a&b=2") // reference quirk: [?&]utm_[^&]+ eats the '?'
    assert(Clean.normalizeUrl("http://www.reddit.com/r/x") ==
      "http://old.reddit.com/r/x")
    assert(Clean.cleanUrl("http://x.test/a?utm_source=rss&b=2") ==
      "http://x.test/a?&b=2") // CleanUrl leaves the bare '?&' (quirk)
  }

  test("youtube template route") {
    val r = clean("https://www.youtube.com/watch?v=abc123&t=9", "<html></html>")
    assert(r.error == null && r.note == "youtube")
    assert(r.content.contains(
      "src=\"https://www.youtube.com/embed/abc123\" frameborder=\"0\""))
  }

  test("pdf and image template routes") {
    val rp = clean("http://x.test/paper.pdf", "")
    assert(rp.note == "pdf")
    assert(rp.content.contains(
      "http://docs.google.com/gview?url=http%3A//x.test/paper.pdf&embedded=true"))
    val ri = clean("http://x.test/photo.JPEG?s=1", "")
    assert(ri.note == "image")
    assert(ri.content.contains("<img src=\"http://x.test/photo.JPEG?s=1\">"))
  }

  test("google docs routes") {
    val r = clean("http://docs.google.com/View?docid=dg7hn48_0f", "")
    assert(r.note == "google-docs")
    assert(r.content.contains("srcid=dg7hn48_0f&chrome=false"))
    val r2 = clean(
      "http://docs.google.com/viewer?url=cache:xyz:example.com/file.pdf", "")
    assert(r2.note == "pdf")
    assert(r2.finalUrl == "http://example.com/file.pdf")
  }

  test(".txt wraps whole payload in <pre>") {
    val r = clean("http://x.test/notes.txt", "plain <text> & stuff")
    assert(r.error == null)
    assert(r.content.contains("<pre>plain &lt;text&gt; &amp; stuff</pre>"))
  }

  test("scoring error on empty page") {
    val r = clean("http://x.test/empty", "<html><body></body></html>")
    assert(r.error == null)
    assert(r.content.endsWith("<p>Scoring error.</p>"))
  }

  test("title header: +11 and strip-before (C11)") {
    val long = "Sentence with plenty of readable words inside it. " * 6
    val html =
      """<html><head><title>The Exact Matching Headline</title></head><body>
        |<p>before junk that should vanish entirely</p>
        |<h1>The Exact Matching Headline</h1>
        |<div id="content"><p>""".stripMargin + long +
        "</p></div></body></html>"
    val r = clean("http://x.test/art", html)
    assert(r.error == null)
    assert(!noShy(r.content).contains("before junk"))
    assert(!noShy(r.content).contains("Matching Headline")) // header stripped too
    assert(noShy(r.content).contains("Sentence with plenty"))
  }

  test("encoding: meta charset latin-1 honored, invalid utf-8 replaced") {
    val latin = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>" +
      ("café déjà vu et plus de texte pour le score. " * 8) +
      "</p></body></html>"
    val bytes = latin.getBytes(StandardCharsets.ISO_8859_1)
    val r = Clean.clean("http://x.test/fr", bytes)
    assert(r.error == null)
    assert(noShy(r.content).contains("café déjà"))
    val bad = Array[Byte]('<', 'p', '>', 0xff.toByte, 0xfe.toByte)
    val r2 = Clean.clean("http://x.test/bad", bad)
    assert(r2.error == null) // total: never throws
  }

  test("gfycat and xkcd special cases") {
    val g = clean("https://gfycat.com/HappyCat",
      "<html><body><video autoplay src=\"v.webm\">x</video></body></html>")
    assert(g.error == null)
    assert(g.content.contains("<video src=\"https://gfycat.com/v.webm\" controls=\"controls\">"))
    val x = clean("http://xkcd.com/100",
      "<html><body><span><span><img alt=\"a\" title=\"t\" src=\"c.png\"/>" +
        "<br/><em>caption</em></span></span></body></html>")
    assert(x.error == null)
    assert(noShy(x.content).contains("caption"))
    assert(!x.content.contains("<br")) // brs stripped inside container
    // gfycat without video → contained error
    val bad = clean("https://gfycat.com/NoVideo", "<html></html>")
    assert(bad.error != null && bad.note == "error")
  }

  test("note fidelity: reference 'cleaned content, <RssError>, <msg>' format") {
    val body = "<p>" + ("Plenty of readable prose for the scorer here. " * 8) + "</p>"
    // no feed link anywhere → NoRssError('no feed link')
    val r1 = clean("http://x.test/a", s"<html><head></head><body>$body</body></html>")
    assert(r1.note == "cleaned content, NoRssError, no feed link")
    // feed link in head → batch engine cannot fetch → could not download/parse
    val r2 = clean("http://x.test/a",
      "<html><head><link rel=\"alternate\" type=\"application/rss+xml\" href=\"/feed.xml\"></head>" +
        s"<body>$body</body></html>")
    assert(r2.note == "cleaned content, NoRssError, could not download/parse feed")
    // reddit short-circuit (clean.py:151) — bare RssError, empty message
    val r3 = clean("http://old.reddit.com/r/scala/xyz", s"<html><body>$body</body></html>")
    assert(r3.note == "cleaned content, RssError, ")
    // docs.google without docid → UnsupportedRssError (extract_feed.py:84)
    val r4 = clean("http://docs.google.com/something", s"<html><body>$body</body></html>")
    assert(r4.note == "cleaned content, UnsupportedRssError, skip google docs")
  }

  test("autorss feed-link scan: head-scoped, first match, SGML quirks") {
    import FeedLogic.rssLinkFromHtml
    val rss = "<link rel=\"alternate\" type=\"application/rss+xml\" href=\"/f.xml\">"
    assert(rssLinkFromHtml(s"<html><head>$rss</head><body></body>") == Some("/f.xml"))
    // link AFTER </head> or <body> is invisible (setnomoretags)
    assert(rssLinkFromHtml(s"<html><head></head>$rss") == None)
    assert(rssLinkFromHtml(s"<html><body>$rss") == None)
    // matching link WITHOUT href ends the scan with no feed (autorss '')
    assert(rssLinkFromHtml(
      "<head><link rel=\"alternate\" type=\"application/rss+xml\">" + rss + "</head>") == None)
    // rel/type must match exactly; atom accepted; attr entity unescape
    assert(rssLinkFromHtml(
      "<head><link rel=\"alternate\" type=\"application/atom+xml\" href=\"/a?x=1&amp;y=2\"></head>")
      == Some("/a?x=1&y=2"))
    assert(rssLinkFromHtml(
      "<head><link rel=\"stylesheet\" type=\"application/rss+xml\" href=\"/f\"></head>") == None)
    // comments and script content are not tag soup
    assert(rssLinkFromHtml(s"<head><!-- $rss --><script>var a = '$rss';</script></head>") == None)
    assert(rssLinkFromHtml(s"<head><script>x='</'+'head>'</script>$rss</head>") == Some("/f.xml"))
  }

  test("reddit comments path via strainer") {
    val html =
      "<html><body><div class=\"junk\">drop</div>" +
        "<div class=\"usertext border\"><div class=\"usertext-body\">" +
        "<p>the comment body text</p></div></div></body></html>"
    val r = clean("http://reddit.com/r/scala/comments/1/x", html)
    assert(r.error == null)
    assert(noShy(r.content).contains("the comment body text"))
    assert(!r.content.contains("drop"))
  }
}
