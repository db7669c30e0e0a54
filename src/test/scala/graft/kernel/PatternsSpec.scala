package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class PatternsSpec extends AnyFunSuite {

  test("separateWords: camelCase, underscores, hyphens (patterns.py:251-269)") {
    assert(Patterns.separateWords("fooBarBaz") == "foo bar baz")
    assert(Patterns.separateWords("foo_bar_baz") == "foo bar baz")
    assert(Patterns.separateWords("foo-bar-baz") == "foo bar baz")
    assert(Patterns.separateWords("ABCWidget") == "abc widget")
    assert(Patterns.separateWords("item2Panel") == "item2 panel")
  }

  test("classid synthesis through process") {
    val doc = HtmlParser.parse(
      "<div class=\"mainContent sideBar\" id=\"post_12\"><p>x</p></div>")
    Patterns.process(doc, "http://t.test/")
    val div = doc.find("div")
    assert(div.attr("classid") == "main content side bar!!!post 12")
  }

  test("depth decay exactness and li-blocker (util.py:61-85)") {
    val doc = HtmlParser.parse(
      "<div><section><article><p><span><em><b>x</b></em></span></p></article></section></div>")
    val b = doc.find("b")
    Patterns.applyScore(b, 10)
    assert(b.score == 10.0)
    assert(doc.find("em").score == 10 * 0.6472278485082303)
    assert(doc.find("span").score == 10 * 0.401877572016461)
    assert(doc.find("p").score == 10 * 0.2373046875)
    assert(doc.find("article").score == 10 * 0.13168724279835398)
    assert(doc.find("section").score == 10 * 0.06754356352880654)
    assert(!doc.find("div").hasScore) // depth 6 > MAX_SCORE_DEPTH
  }

  test("li blocker semantics: positive score stops AT the li") {
    val doc = HtmlParser.parse("<ul><li><p>x</p></li></ul>")
    val p = doc.find("p")
    Patterns.applyScore(p, 3)
    assert(p.score == 3.0)
    assert(!doc.find("li").hasScore)
    assert(!doc.find("ul").hasScore)
    // negative scores pass through li
    Patterns.applyScore(p, -2)
    assert(doc.find("li").hasScore)
  }

  test("textLen: excludes a/script text, collapses runs, strips entities") {
    val doc = HtmlParser.parse(
      "<p>one   two\t three <a>LINKTEXT</a><script>var x;</script></p>")
    val p = doc.find("p")
    // 'one   two\t three ' → strip per-node → 'one   two\t three' →
    // runs collapsed → 'one two three' = 13
    assert(Patterns.textLen(p) == 13)
    val doc2 = HtmlParser.parse("<p>a &amp;nbsp; b</p>")
    // parse decodes &amp; → text 'a &nbsp; b'; entity regex strips '&nbsp;'
    assert(Patterns.textLen(doc2.find("p")) == 4)
  }

  test("tagSize ladder (patterns.py:421-437, util.py:197-213)") {
    def size(html: String): Long =
      Patterns.tagSize(HtmlParser.parse(html).find("img"))
    assert(size("<img width=\"10\" height=\"400\">") == 1L) // <25 → 1
    assert(size("<img width=\"25\" height=\"25\">") == 625L)
    assert(size("<img width=\"100%\" height=\"100%\">") == 240000L)
    assert(size("<img style=\"width: 300px; height: 200px\">") == 60000L)
    assert(size("<img width=\"300\">") == -1L)
    assert(size("<img width=\"30a\" height=\"40\">") == -1L)
    assert(size("<img>") == -1L)
  }

  test("isLeafBlock and isList") {
    val doc = HtmlParser.parse(
      "<div><p>x</p></div><p>y</p><ul></ul><center><a>1</a><a>2</a><a>3</a>" +
        "<a>4</a><a>5</a><a>6</a><a>7</a><a>8</a></center>")
    assert(!Patterns.isLeafBlock(doc.find("div")))
    assert(Patterns.isLeafBlock(doc.findAll("p")(1)))
    assert(Patterns.isList(doc.find("ul")))
    assert(Patterns.isList(doc.find("center")))
  }

  test("ATTR_POINTS: word/whole/any semantics on classid") {
    def scoreOf(cls: String): Double = {
      // 25-char body: inside [20,50) so leaf-block scoring is neutral.
      val doc = HtmlParser.parse(
        s"""<div class="$cls">abcdefghijklmnopqrstuvwxy</div>""")
      Patterns.process(doc, "http://t.test/")
      val d = doc.find("div")
      if (d != null && d.hasScore) d.score else 0.0
    }
    assert(scoreOf("story") == 10.0) // _ReWhole('story')
    assert(scoreOf("email") == -15.0) // _ReWord
    assert(scoreOf("menuFoo") == -5.0) // _ReAny('menu') on 'menu foo'
  }

  test("ATTR_POINTS articleBody cumulative value") {
    val doc = HtmlParser.parse(
      "<div class=\"articleBody\">abcdefghijklmnopqrstuvwxy</div>")
    Patterns.process(doc, "http://t.test/")
    // classid 'article body': matches word article(?! tool) +4, ^article +5,
    // word body(text)? +5, ^(article|kona) ?(body|copy) +10 = 24
    assert(doc.find("div").score == 24.0)
  }

  test("parent suppression: same attr matching same pattern on parent") {
    // inner text is 25 chars: inside the [20,50) window so leaf-block
    // scoring contributes nothing and the point rule is isolated.
    val doc = HtmlParser.parse(
      "<div class=\"story\"><div class=\"story\">abcdefghijklmnopqrstuvwxy</div></div>")
    Patterns.process(doc, "http://t.test/")
    val outer = doc.findAll("div").head
    val inner = doc.findAll("div")(1)
    // outer: +10; inner: suppressed (parent classid matches same pattern)
    // but outer also receives decayed propagation? No: inner applied 0.
    assert(outer.score == 10.0)
    assert(!inner.hasScore)
  }

  test("self-link strip and out-link score (patterns.py:334-349)") {
    val url = "http://t.test/page"
    val doc = HtmlParser.parse(
      "<div><a href=\"http://t.test/page\">self</a>" +
        "<a href=\"http://other.test/x\">out</a>" +
        "<a href=\"/local\">same</a></div>")
    Patterns.process(doc, url)
    val anchors = doc.findAll("a")
    assert(anchors.length == 2) // self link stripped
    assert(anchors.head.score == 1.0) // out-link
    assert(!anchors(1).hasScore) // same-domain relative: no score
  }

  test("leaf block text thresholds (patterns.py:352-367)") {
    def pScore(text: String, tag: String = "p"): Double = {
      val doc = HtmlParser.parse(s"<$tag>$text</$tag>")
      Patterns.process(doc, "http://t.test/")
      val e = doc.find(tag)
      if (e.hasScore) e.score else 0.0
    }
    assert(pScore("short") == -0.75)
    assert(pScore("x" * 20) == 0.0) // 20 not < 20, not > 50
    assert(pScore("x" * 51) == 3.0)
    assert(pScore("x" * 251) == 7.0) // 3 + 4 cumulative
    assert(pScore("short", "td") == 0.0) // td exempt from short penalty
  }

  test("only_anchor penalty (zero text + <a> + no <img>)") {
    val doc = HtmlParser.parse("<p><a href=\"http://other.test/\">  </a></p>")
    Patterns.process(doc, "http://t.test/")
    val p = doc.find("p")
    // a gets +1.0 out_link (propagates 0.647 to p), p gets -2 only_anchor
    assert(math.abs(p.score - (-2.0 + 0.6472278485082303)) < 1e-12)
  }

  test("STRIP_TAGS and the >2000-char keeper (patterns.py:389-397)") {
    val doc = HtmlParser.parse("<div><script>junk</script><p>keep</p></div>")
    Patterns.process(doc, "http://t.test/")
    assert(doc.find("script") == null)
    val long = "x" * 2001
    val doc2 = HtmlParser.parse(s"<div><style>$long</style></div>")
    Patterns.process(doc2, "http://t.test/")
    assert(doc2.find("style") != null)
  }

  test("ATTR_STRIP rules fire on classid / src / style") {
    def stripped(html: String, name: String): Boolean = {
      val doc = HtmlParser.parse(html)
      Patterns.process(doc, "http://t.test/")
      doc.find(name) == null
    }
    assert(stripped("<div class=\"comment\">x</div>", "div"))
    assert(stripped("<div class=\"sidebar2\">x</div>", "div"))
    assert(stripped("<img src=\"http://ad.doubleclick.net/x.gif\">", "img"))
    assert(stripped("<div style=\"display: none\">x</div>", "div"))
    assert(stripped("<div class=\"widget\">x</div>", "div"))
    assert(!stripped("<div class=\"nonwidget\">x</div>", "div"))
    // stripped subtree not recursed into: inner never scored
    val doc = HtmlParser.parse(
      "<div class=\"comment\"><div class=\"story\">x</div></div>")
    Patterns.process(doc, "http://t.test/")
    assert(doc.find("div") == null)
  }

  test("related-list strip with previous header (patterns.py:399-405)") {
    val doc = HtmlParser.parse(
      "<div><h3>Related Posts</h3><ul><li><a href=\"u\">a</a></li></ul>" +
        "<p>body stays</p></div>")
    Patterns.process(doc, "http://t.test/")
    assert(doc.find("ul") == null)
    assert(doc.find("h3") == null)
    assert(doc.find("p") != null)
  }

  test("false-positive undo at threshold (patterns.py:459-481)") {
    // 15 divs with class 'story' (whole-match +10): rule reversed.
    // 25-char text keeps leaf-block scoring out of the picture.
    val inner = (1 to 15).map(_ =>
      s"""<div class="story">abcdefghijklmnopqrstuvwxy</div>""").mkString
    val doc = HtmlParser.parse(s"<div>$inner</div>")
    Patterns.process(doc, "http://t.test/")
    val divs = doc.findAll((e: Elem) => e.attr("classid") == "story")
    assert(divs.length == 15)
    // +10 then -10 → net 0.0 (score attr still present as float 0.0)
    assert(divs.forall(d => d.hasScore && d.score == 0.0))
  }
}
