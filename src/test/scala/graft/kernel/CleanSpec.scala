package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class CleanSpec extends AnyFunSuite {

  private def noShy(s: String): String = s.replace("­", "")

  private def clean(url: String, html: String): Clean.Cleaned =
    Clean.clean(url, html.getBytes(StandardCharsets.UTF_8))

  test("C14 intended br->p transform — documentation fixture (extract_content.py:156-190)") {
    // The pipeline deliberately does NOT run this pass: in the pinned
    // reference `next_tagSibling` (extract_content.py:164) doesn't exist
    // on bs4 tags, so the pass is a no-op there, and the 222 goldens pin
    // the engine to that no-op. This fixture documents what the
    // reference WOULD do if upstream fixed the property (VERDICT r03
    // task 7): br+br = paragraph break.
    val soup = HtmlParser.parse(
      "<html><body><div><p>head</p>intro text<br>\n<br>second run<br>tail</div></body></html>")
    Extract.transformBrsToParagraphsIntended(soup)
    val div = soup.find("div")
    val out = div.serialized
    // the br+br pair became a <p> holding the gathered run (gather
    // stopped at the <p> block boundary); the lone third br is untouched
    assert(out == "<div><p>head</p><p>intro text</p>\nsecond run<br/>tail</div>", out)
  }

  test("east-asian no-meta discrimination: SJIS / GBK / EUC-KR / cp1252 (VERDICT r03 task 5)") {
    def body(s: String) = s"<html><body><p>$s</p></body></html>"
    val jp = body("これは日本語のテストです記事本文")
    val zh = body("中文测试文本内容这是一个测试页面")
    val ko = body("한국어 시험 문서입니다 가나다라 마바사")
    assert(Clean.decodeHtml(jp.getBytes("Shift_JIS")) == jp)
    assert(Clean.decodeHtml(zh.getBytes("GBK")) == zh)
    assert(Clean.decodeHtml(ko.getBytes("EUC-KR")) == ko)
    // latin-1 text with accents is no east-asian stream → cp1252 fallback
    val fr = body("café déjà vu naïveté résumé")
    assert(Clean.decodeHtml(fr.getBytes("ISO-8859-1")) == fr)
    // below the evidence floor (3 kana units < 4) → cp1252, not SJIS
    val tiny = body("abc アイウ").getBytes("Shift_JIS")
    assert(Clean.detectEastAsian(tiny).isEmpty)
    // a declared meta charset beats every sniff branch
    val declared = ("<html><head><meta charset=\"ISO-8859-1\"></head><body><p>" +
      "café</p></body></html>").getBytes("ISO-8859-1")
    assert(Clean.decodeHtml(declared).contains("café"))
  }

  test("east-asian no-meta discrimination: EUC-JP / Big5 branches (VERDICT r04 task 3)") {
    def body(s: String) = s"<html><body><p>$s</p></body></html>"
    // hiragana/katakana-dominated Japanese: kana rows 0xA4/0xA5 ≥ 30%
    val jp = body("これは日本語のテストです記事本文")
    assert(Clean.decodeHtml(jp.getBytes("EUC-JP")) == jp)
    // the SS2 half-width-kana form is structurally EUC-JP-only
    val jpHalf = body("ﾃｽﾄ記事です本文内容")
    assert(Clean.decodeHtml(jpHalf.getBytes("EUC-JP")) == jpHalf)
    // traditional Chinese with at least one low-trail pair (一 = A4 40)
    val tw = body("中文測試內容這是一個測試頁面")
    assert(Clean.decodeHtml(tw.getBytes("Big5")) == tw)
    // Korean must still win over the new EUC-JP branch (0% kana rows)
    val ko = body("한국어 시험 문서입니다 가나다라 마바사")
    assert(Clean.decodeHtml(ko.getBytes("EUC-KR")) == ko)
  }

  test("GBK verdict needs majority double-high pairs: cp1252 accent+letter text stays cp1252 (ADVICE r04)") {
    def body(s: String) = s"<html><body><p>$s</p></body></html>"
    // every umlaut is followed by an ASCII letter, so the stream walks
    // the GBK machine (lead 0xFC/0xF6 + low trail) but contains zero
    // double-high pairs — must fall back to cp1252, not decode as GBK
    val de = body("Müller für Bücher schön müde Köln Süden")
    assert(Clean.decodeHtml(de.getBytes("windows-1252")) == de)
  }

  test("meta charset beats BOM-looking prefix bytes (ADVICE r03)") {
    // cp1252 page whose body starts with 0xFF 0xFE ('ÿþ') but DECLARES
    // its charset: the declaration must win — r03 decoded this as UTF-16
    val html = "<html><head><meta charset=\"windows-1252\"></head><body>" +
      "<p>ÿþ café</p></body></html>"
    val bytes = html.getBytes("windows-1252")
    // prefix trick: move the ÿþ to byte 0 via a leading text hack is not
    // valid html; instead hand-build bytes starting with FF FE followed
    // by the declared page — the decoder must still honor the meta tag
    val prefixed = Array(0xFF.toByte, 0xFE.toByte) ++ bytes
    val out = Clean.decodeHtml(prefixed)
    assert(out.contains("café"), s"meta-declared cp1252 lost to BOM sniff: ${out.take(80)}")
    assert(out.startsWith("ÿþ"), "the two lead bytes decode as cp1252 ÿþ text")
    // a genuine UTF-16 page (no meta can match through the NULs) still
    // takes the BOM branch
    val u16 = ("<html><body><p>café zw1</p></body></html>").getBytes("UTF-16")
    assert(Clean.decodeHtml(u16).contains("café zw1"))
  }

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

  test("pinned cascade corners: kana-free kanji EUC-JP -> GBK; low-trail GBK -> Big5") {
    // The two documented residual chardet deviations (SURVEY §0.1,
    // VERDICT r05 task 5), pinned at the detector level so a cascade
    // refactor that moves them fails here AND at the byte-golden.
    val kanjiJp = "日本語試験記事本文内容演習問題文章構造解析結果報告書類提出期限厳守"
    val d1 = Clean.detectEastAsian(kanjiJp.getBytes("EUC-JP"))
    assert(d1.map(_.name) == Some("GBK"), s"corner 1 moved: $d1")
    val extHanzi = "狜狝狟狢狣狤狥狦狧狪狫狵狶狹狽狾狿猀猂猄猅猆猇猈猉猋猌猍猏猐"
    val d2 = Clean.detectEastAsian(extHanzi.getBytes("GBK"))
    assert(d2.map(_.name) == Some("Big5"), s"corner 2 moved: $d2")
  }
}
