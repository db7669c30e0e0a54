package graft.spark

/** Authored golden fixture registry (FIXTURES.md §3, VERDICT r01 task 1):
  * per-rule end-to-end pages for the highest-traffic ATTR_POINTS /
  * ATTR_STRIP rules (`patterns.py:48-231`), the munge passes M1-M13
  * (`clean.py:193-241`), URL routes, and degenerate inputs. Each case is a
  * full page run through `Clean.clean`; the frozen byte-golden under
  * `src/test/resources/golden/expected/` is the contract, and
  * `mustContain`/`mustNotContain` markers make the INTENT of each case
  * machine-checkable (GoldenSpec asserts both).
  *
  * Marker conventions: winner text carries `zw1`, loser/junk text carries
  * `jnk` — both ≤3 chars so the hyphenation pass (M11) can never split
  * them and fake a pass/fail.
  *
  * Case files are materialized by `GoldenCasesGenCli` (writes cases/ +
  * index.tsv + expected/) — run deliberately, diff before committing.
  */
object GoldenCases {

  final case class GCase(
      name: String,
      url: String,
      bytes: Array[Byte],
      mustContain: Seq[String] = Nil,
      mustNotContain: Seq[String] = Nil)

  private def c(name: String, url: String, html: String,
      mustContain: Seq[String] = Nil, mustNotContain: Seq[String] = Nil): GCase =
    GCase(name, url, html.getBytes("UTF-8"), mustContain, mustNotContain)

  /** Two texts of identical length: only rule points can tip the vote.
    * Winner text carries zw1; loser text zl0 (same char counts).
    */
  private val WinText =
    "The vote should land on this div because rule points tip it zw1 way, and there is enough prose here to clear every leaf block threshold comfortably."
  private val LoseText =
    "The vote should land on that div because rule points tip it zl0 way, and there is enough prose here to clear every leaf block threshold comfortably."

  private def threeParas(text: String): String =
    s"<p>$text</p>\n<p>$text</p>\n<p>$text</p>"

  private def page(body: String): String =
    s"<html>\n<head><title>fixture</title></head>\n<body>\n$body\n</body>\n</html>\n"

  /** A/B page for a POSITIVE points rule: the ruled div comes FIRST, so
    * without the boost the doc-order-last tie-break would pick the plain
    * div — the ruled div winning proves the boost moved selection. Each
    * candidate sits one neutral wrapper deep so <body>'s decayed
    * both-sides aggregation cannot outscore the candidates even for
    * small-point rules (depth-decay: body takes decay(3) of leaf points
    * instead of decay(2)).
    */
  private def boostCase(name: String, ruleClass: String): GCase =
    c(s"points_$name", s"http://fixtures.test/points/$name",
      page(
        s"""<div class="wrapone"><div class="$ruleClass">\n${threeParas(WinText)}\n</div></div>\n<div class="wraptwo"><div class="plain">\n${threeParas(LoseText)}\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0"))

  /** A/B page for a NEGATIVE points rule: the penalized div comes LAST, so
    * without the penalty the tie-break would pick it — the plain div
    * winning proves the penalty moved selection. Wrapper rationale as in
    * boostCase.
    */
  private def penaltyCase(name: String, ruleClass: String): GCase =
    c(s"points_$name", s"http://fixtures.test/points/$name",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n</div></div>\n<div class="wraptwo"><div class="$ruleClass">\n${threeParas(LoseText)}\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0"))

  /** Page for an ATTR_STRIP rule: junk node with the matching attr inside
    * a +20 storyblock winner; the junk must be gone from the output.
    */
  private def stripCase(name: String, junkTag: String): GCase =
    c(s"strip_$name", s"http://fixtures.test/strip/$name",
      page(
        s"""<div class="storyblock">\n<p>$WinText</p>\n$junkTag\n<p>$WinText</p>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk"))

  private def stripClassCase(name: String, ruleClass: String): GCase =
    stripCase(name, s"""<div class="$ruleClass"><p>this jnk block must be stripped</p></div>""")

  // ------------------------------------------------------------- points/

  val pointsCases: Seq[GCase] = Seq(
    boostCase("story_whole", "story"),         // +10 _ReWhole story
    boostCase("entry_word", "entry"),          // +10 _ReWord entry
    boostCase("hentry", "hentry"),             // +12 _ReWhole h?entry
    boostCase("storyblock", "storyblock"),     // +20 _ReWhole story(body|block)
    boostCase("articlecopy", "articlecopy"),   // +10 _ReAny ^(article|kona) ?(body|copy)
    penaltyCase("side_whole", "side"),         // -15 _ReWhole side
    penaltyCase("twitter_word", "twitter box"),// -15 _ReWord twitter
    penaltyCase("overlay_word", "overlay"),    // -10 _ReWord overlay
    penaltyCase("email_word", "email"),        // -15 _ReWord email
    penaltyCase("menu_any", "menucontainer"),  // -5 _ReAny menu
    // -5 rel=tag on an anchor, decayed into its container; both divs carry
    // an equal-text anchor so link text length cancels out
    c("points_reltag", "http://fixtures.test/points/reltag",
      page(
        s"""<div class="plain">\n${threeParas(WinText)}\n<a href="/t/y">taglink</a>\n</div>\n<div class="plain2">\n${threeParas(LoseText)}\n<a rel="tag" href="/t/x">taglink</a>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // -3 href ^javascript: ; both divs carry 3 out-of-domain anchors (+1
    // each) so only the javascript: penalty differs — 3 anchors keep the
    // divs' scores above <body>'s both-sides aggregation
    c("points_jshref", "http://fixtures.test/points/jshref",
      page(
        s"""<div class="plain">\n${threeParas(WinText)}\n<a href="http://other.test/x">extlink</a> <a href="http://other.test/y">extlink</a> <a href="http://other.test/z">extlink</a>\n</div>\n<div class="plain2">\n${threeParas(LoseText)}\n<a href="javascript:void(0)">extlink</a> <a href="javascript:void(1)">extlink</a> <a href="javascript:void(2)">extlink</a>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C4 parent suppression: inner div's identical classid match must NOT
    // double-apply (the outer still wins; frozen score pins the arithmetic)
    c("points_parent_suppress", "http://fixtures.test/points/parent_suppress",
      page(
        s"""<div class="story">\n<div class="story">\n${threeParas(WinText)}\n</div>\n</div>\n<div class="plain">\n${threeParas(LoseText)}\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // round-2 batch 2: more high-traffic rules
    boostCase("bodytext_word", "bodytext"),     // +5 _ReWord body(text)?
    boostCase("single_word", "single"),         // +5 _ReWord single
    boostCase("permalink_whole", "permalink"),  // +5 _ReWhole permalink
    boostCase("meat_whole", "meat"),            // +10 _ReWhole meat
    boostCase("wide_word", "wide"),             // +10 _ReWord (?<!ad )wide
    boostCase("postbody_word", "post-body"),    // +10 _ReWord post...body
    penaltyCase("print_word", "print"),         // -10 _ReWord print
    penaltyCase("lightbox_word", "lightbox"),   // -5 _ReWord lightbox
    penaltyCase("links_word", "links"),         // -5 _ReWord links
    penaltyCase("meta_word", "meta"),           // -2 _ReWord meta(data)?
    penaltyCase("biobox_whole", "bio box")      // -7 _ReWhole bio box
  )

  // -------------------------------------------------------------- strip/

  val stripCases: Seq[GCase] = Seq(
    stripClassCase("comment_word", "comment"),
    stripClassCase("nav_word", "nav"),
    stripClassCase("sidebar_whole", "sidebar2"),
    stripClassCase("share_whole", "share"),
    stripClassCase("social_word", "social"),
    stripClassCase("widget_word", "widget"),
    stripClassCase("byline_word", "byline"),
    stripClassCase("related_word", "related3"),
    stripClassCase("hidden_word", "hidden"),
    stripClassCase("breadcrumb_whole", "breadcrumb"),
    stripClassCase("authorbox_word", "authorbox"),
    stripCase("display_none",
      """<div style="display: none"><p>this jnk block must be stripped</p></div>"""),
    stripCase("doubleclick_src",
      """<img src="http://ad.doubleclick.net/jnk.gif" width="300" height="250">"""),
    stripCase("feedads_href",
      """<a href="http://feedads.g.doubleclick.net/jnk">jnk feed ad</a>"""),
    // round-2 batch 2
    stripClassCase("archive_word", "archive"),
    stripClassCase("logo_word", "logo"),
    stripClassCase("readmore_word", "read-more"), // separateWords: '-'→' '
    stripClassCase("tags_word", "tags"),
    stripClassCase("talkback_word", "talkback"),
    stripClassCase("replies_word", "replies"),
    stripClassCase("pagination_whole", "pagination"),
    stripClassCase("searchbar_whole", "searchbar"),
    stripClassCase("respond_whole", "respond"),
    stripClassCase("adsense_any", "adsense"),
    stripCase("smilies_src",
      """<img src="/img/smilies/jnk.gif" width="20" height="20">"""),
    stripCase("quantserve_src",
      """<img src="http://pixel.quantserve.com/jnk.gif" width="1" height="1">""")
  )

  // -------------------------------------------------------------- munge/

  private def mungePage(name: String, inner: String,
      mustContain: Seq[String] = Nil, mustNotContain: Seq[String] = Nil): GCase =
    c(s"munge_$name", s"http://fixtures.test/munge/$name",
      page(s"""<div class="storyblock">\n$inner\n</div>"""),
      mustContain, mustNotContain)

  val mungeCases: Seq[GCase] = Seq(
    // M2: the <br> directly after each <p> is stripped (exactly one per p
    // — clean.py:281-285 checks findNextSibling once, not repeatedly)
    mungePage("br_after_p",
      s"<p>$WinText</p><br>\n<p>$WinText</p><br>",
      mustContain = Seq("zw1"), mustNotContain = Seq("<br")),
    // M3: a trailing <hr> (true last child) is stripped; an interior one
    // is kept. NB a trailing whitespace TEXT node shields the hr — the
    // reference's AttributeError guard (clean.py:327-332) stops at any
    // non-tag — so the hr here sits hard against </div>.
    c("munge_trailing_hr", "http://fixtures.test/munge/trailing_hr",
      page(s"""<div class="storyblock"><p>$WinText</p>\n<hr>\n<p>$WinText</p><hr></div>"""),
      mustContain = Seq("zw1", "<hr/>"),
      mustNotContain = Seq("<hr/></div>", "<hr/> </div>")),
    // M4: empty-strip cascade removes the hollow wrapper chain
    mungePage("empty_cascade",
      s"<p>$WinText</p>\n<div><span> </span></div>\n<p>$WinText</p>",
      mustContain = Seq("zw1"), mustNotContain = Seq("<span")),
    // M5: a winner that is a bare wrapper descends to its only child
    mungePage("root_descent",
      s"""<div class="innerwrap">\n<p>$WinText</p>\n<p>$WinText</p>\n</div>""",
      mustContain = Seq("zw1")),
    // M6: child subtree scored ≤ -2 (class=print, -10) is stripped
    mungePage("score_neg2",
      s"""<p>$WinText</p>\n<div class="print"><p>jnk low scored child block</p></div>\n<p>$WinText</p>""",
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk")),
    // M7: event-handler attrs stripped; 'onchange' SURVIVES (the
    // reference's STRIP_ATTRS has the key 'onchange ' with a trailing
    // space — clean.py quirk, replicated bit-for-bit)
    mungePage("attr_strip",
      s"""<p onclick="evil()" onchange="kept()" onmouseover="evil2()">$WinText</p>\n<p>$WinText</p>""",
      mustContain = Seq("zw1", "onchange=\"kept()\""),
      mustNotContain = Seq("onclick", "onmouseover")),
    // M8: relative href/src absolutized against the final url
    mungePage("absolutize",
      s"""<p>$WinText</p>\n<p><a href="sub/rel.html">rel link text</a> <img src="../img/pic.jpg" width="640" height="480" alt="x"></p>\n<p>$WinText</p>""",
      mustContain = Seq(
        "href=\"http://fixtures.test/munge/sub/rel.html\"",
        "src=\"http://fixtures.test/img/pic.jpg\"")),
    // M9: aligned images get the align attribute from style/class
    mungePage("img_align",
      s"""<p>$WinText</p>\n<img src="/i/a.jpg" style="float: right" width="640" height="480" alt="y">\n<p>$WinText</p>""",
      mustContain = Seq("align=\"right\"")),
    // M10: headers downgrade by 2 (h2→h4), capped at h6 (h5→h6)
    mungePage("header_downgrade",
      s"""<h2>Part One</h2>\n<p>$WinText</p>\n<h5>Part Two</h5>\n<p>$WinText</p>""",
      mustContain = Seq("<h4>", "<h6>"),
      mustNotContain = Seq("<h2>", "<h5>")),
    // M11: Liang exceptions — as-so-ciate and ta-ble hyphenate at the
    // exception points; 'project' is an exception with NO break points
    mungePage("hyphen_exceptions",
      s"""<p>$WinText</p>\n<p>The associate put the table project documentation away carefully zw1 today.</p>""",
      mustContain = Seq("as­so­ciate", "ta­ble", " project "),
      mustNotContain = Seq("pro­ject")),
    // M11 edge: <pre> text is never hyphenated
    mungePage("pre_exempt",
      s"""<p>$WinText</p>\n<pre>associate table documentation</pre>\n<p>$WinText</p>""",
      mustContain = Seq("<pre>associate table documentation</pre>")),
    // M12: noscript renamed to div (markers are hyphenation-proof: short
    // words only; the <noscript check excludes the url's own path)
    mungePage("ns_to_div",
      s"""<p>$WinText</p>\n<noscript><p>kept zw1 text</p></noscript>\n<p>$WinText</p>""",
      mustContain = Seq("<div><p>kept zw1 text</p></div>"),
      mustNotContain = Seq("<noscript")),
    // M13 serializer: entity round-trip (&amp; re-escaped, charref
    // resolved to the literal character)
    mungePage("entities",
      s"""<p>$WinText</p>\n<p>AT&amp;T sells &lt;io&gt; &#8212; bulk only zw1 today.</p>""",
      mustContain = Seq("AT&amp;T", "&lt;io&gt;", "—"))
  )

  // -------------------------------------------------------------- routes/

  val routeCases: Seq[GCase] = Seq(
    c("route_hashbang", "http://fixtures.test/app#!p=2",
      page(s"""<div class="storyblock">\n${threeParas(WinText)}\n</div>"""),
      mustContain = Seq("_escaped_fragment_=p=2", "zw1")),
    c("route_utm", "http://fixtures.test/art?utm_source=feedburner",
      page(s"""<div class="storyblock">\n${threeParas(WinText)}\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("utm_source")),
    c("route_googledocs",
      "http://docs.google.com/View?docid=dg7abc123_55&hl=en",
      "<html><body>ignored</body></html>",
      mustContain = Seq("srcid=dg7abc123_55", "Open Original")),
    c("route_pdf", "http://fixtures.test/papers/whitepaper.pdf",
      "",
      mustContain = Seq(
        "http://docs.google.com/gview?url=http%3A//fixtures.test/papers/whitepaper.pdf",
        "Open PDF")),
    // U10/urlizetrunc: display text truncated with … for long urls
    c("route_image_trunc",
      "http://fixtures.test/media/" + ("x" * 60) + "/photo.png",
      "",
      mustContain = Seq("<img src=\"http://fixtures.test/media/", "…")),
    c("route_reddit",
      "http://reddit.com/r/scala/comments/42/fixture",
      "<html><body><div class=\"junk\"><p>sidebar jnk</p></div>" +
        "<div class=\"usertext border\"><div class=\"usertext-body\">" +
        s"<p>$WinText</p></div></div></body></html>",
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk"))
  )

  // ----------------------------------- tags/blocks/links/images/structure/

  val structuralCases: Seq[GCase] = Seq(
    // R1: STRIP_TAGS member with >2000 chars of text is KEPT
    // (patterns.py:395); a short one is stripped
    c("tags_keeper", "http://fixtures.test/tags/keeper",
      page(s"""<div class="storyblock">\n<p>$WinText</p>\n<script>var jnk = 1;</script>\n<iframe>kept zw1 ${"filler words for the keeper threshold " * 55}</iframe>\n</div>"""),
      mustContain = Seq("kept zw1", "<iframe>"),
      mustNotContain = Seq("jnk")),
    // C7 boundary: leaf text of exactly 51 chars scores +3, exactly 50
    // scores 0 — the 51-char div (FIRST, so tie-break would lose) wins
    c("blocks_gt50_boundary", "http://fixtures.test/blocks/gt50",
      page({
        val a = "zw1 " + ("a" * 47) // 51 chars
        val b = "zl0 " + ("b" * 46) // 50 chars
        s"""<div class="plain"><p>$a</p><p>$a</p><p>$a</p></div>\n<div class="plain2"><p>$b</p><p>$b</p><p>$b</p></div>"""
      }),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C6/R4: an anchor whose href is exactly this page is stripped
    c("links_selflink", "http://fixtures.test/links/selflink",
      page(s"""<div class="storyblock">\n<p>$WinText</p>\n<p><a href="http://fixtures.test/links/selflink">jnk self link</a></p>\n<p>$WinText</p>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk")),
    // C8: image size points tip selection — big img (+3+4) vs tiny (-1.5);
    // the big-img div is FIRST so the win proves the points
    c("images_size_points", "http://fixtures.test/images/size_points",
      page(
        s"""<div class="plain">\n${threeParas(WinText)}\n<img src="/i/big.jpg" width="640" height="480" alt="b">\n</div>\n<div class="plain2">\n${threeParas(LoseText)}\n<img src="/i/tiny.gif" width="5" height="4" alt="t">\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C12: equal scores → document-order-LAST wins (stable sort). Both
    // candidates carry +10 'entry' and sit one wrapper deep so each
    // outscores <body>'s decayed both-sides aggregation; only document
    // order separates them.
    c("structure_tiebreak", "http://fixtures.test/structure/tiebreak",
      page(
        s"""<div class="wrapone"><div class="entry">\n${threeParas(WinText)}\n</div></div>\n<div class="wraptwo"><div class="entry">\n${threeParas(LoseText)}\n</div></div>"""),
      mustContain = Seq("zl0"), mustNotContain = Seq("zw1")),
    // R2: related-links list + its header stripped from the winner
    c("lists_related_strip", "http://fixtures.test/lists/related",
      page(s"""<div class="storyblock">\n<p>$WinText</p>\n<h4>Related stories</h4>\n<ul><li><a href="/r1">jnk one</a></li><li><a href="/r2">jnk two</a></li></ul>\n<p>$WinText</p>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk", "Related")),
    // C7: 19-char leaf blocks carry -0.75, 21-char ones 0 — the short-text
    // penalty decides between otherwise-equal candidates
    c("blocks_short_penalty", "http://fixtures.test/blocks/short_penalty",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<p>${"x" * 21}</p><p>${"y" * 21}</p><p>${"w" * 21}</p>\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<p>${"x" * 19}</p><p>${"y" * 19}</p><p>${"w" * 19}</p>\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C8: alt text > 50 chars gives +2 — the long-alt image's div wins
    c("images_alt_bonus", "http://fixtures.test/images/alt_bonus",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<img src="/i/a.jpg" width="200" height="200" alt="${"a descriptive caption easily exceeding the fifty character bonus bar"}">\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<img src="/i/b.jpg" width="200" height="200" alt="short">\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C6: out-of-domain links score +1 each; same-domain links score 0
    c("links_outdomain_bonus", "http://fixtures.test/links/outdomain",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<p><a href="http://other1.test/a">ref</a> <a href="http://other2.test/b">ref</a> <a href="http://other3.test/c">ref</a></p>\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<p><a href="/local/a">ref</a> <a href="/local/b">ref</a> <a href="/local/c">ref</a></p>\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // R2 via the blockquote list-form: (<br> - item){2,} quotes under a
    // "See also" header are related-link lists and get stripped
    c("lists_blockquote_form", "http://fixtures.test/lists/blockquote",
      page(s"""<div class="storyblock">\n<p>$WinText</p>\n<h4>See also</h4>\n<blockquote>intro<br> - jnk item one<br> - jnk item two</blockquote>\n<p>$WinText</p>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk", "See also")),
    // R2 via the center-of-anchors form: a <center> with ≥8 direct links
    // under a related header is a list and gets stripped
    c("lists_center_form", "http://fixtures.test/lists/center",
      page(s"""<div class="storyblock">\n<p>$WinText</p>\n<h4>Most popular</h4>\n<center>${(1 to 8).map(i => s"""<a href="/p$i">jnk $i</a>""").mkString(" ")}</center>\n<p>$WinText</p>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("jnk")),
    // C9: positive scores never propagate past an <li> — a candidate whose
    // (longer!) prose sits inside a list accumulates nothing at div level
    c("structure_li_blocker", "http://fixtures.test/structure/li_blocker",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n</div></div>\n<div class="wraptwo"><div class="plain2">\n<ul><li><p>$LoseText</p><p>$LoseText</p><p>$LoseText</p><p>$LoseText</p><p>$LoseText</p></li></ul>\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0"))
  )

  // ------------------------------------------------------------ encoding/

  val encodingCases: Seq[GCase] = Seq(
    // UTF-8 BOM survives decode as U+FEFF (frozen; the reference's
    // requests.text behaves likewise with utf-8-sig undetected)
    GCase("enc_bom", "http://fixtures.test/enc/bom",
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        page(s"""<div class="storyblock">\n${threeParas(WinText)}\n</div>""").getBytes("UTF-8"),
      mustContain = Seq("zw1")),
    // uppercase charset name honored; latin-1 é decodes correctly
    GCase("enc_latin1_upper", "http://fixtures.test/enc/latin1",
      ("<html><head><meta charset=\"ISO-8859-1\"><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>café zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("ISO-8859-1"),
      mustContain = Seq("café", "zw1")),
    // bogus declared charset → UTF-8 fallback with replacement
    GCase("enc_bad_charset", "http://fixtures.test/enc/badcharset",
      ("<html><head><meta charset=\"bogus-enc-42\"><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>café zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("UTF-8"),
      mustContain = Seq("café", "zw1")),
    // NO meta charset + invalid-UTF-8 bytes → the r03 deterministic
    // discriminator decodes windows-1252 (the chardet-gap common case)
    GCase("enc_latin1_nometa", "http://fixtures.test/enc/latin1nometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>café zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("ISO-8859-1"),
      mustContain = Seq("café", "zw1")),
    // NO meta charset + strictly-valid UTF-8 multibyte bytes → UTF-8
    GCase("enc_utf8_nometa", "http://fixtures.test/enc/utf8nometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>café zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("UTF-8"),
      mustContain = Seq("café", "zw1")),
    // UTF-16LE with BOM: meta sniff is NUL-blind and the bytes are never
    // valid UTF-8 — the BOM branch must decode it (r03)
    GCase("enc_utf16le_bom", "http://fixtures.test/enc/utf16le",
      ("﻿<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>café zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("UTF-16LE"),
      mustContain = Seq("café", "zw1")),
    GCase("enc_utf16be_bom", "http://fixtures.test/enc/utf16be",
      ("﻿<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>café zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("UTF-16BE"),
      mustContain = Seq("café", "zw1")),
    // NO meta + Shift-JIS bytes (hiragana/katakana rows 0x82/0x83 — the
    // SJIS-distinctive leads): the r04 east-asian cascade decodes SJIS
    // where r03 produced cp1252 mojibake (VERDICT r03 task 5)
    GCase("enc_sjis_nometa", "http://fixtures.test/enc/sjisnometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>これは日本語のテストです記事本文 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("Shift_JIS"),
      mustContain = Seq("日本語のテスト", "zw1")),
    // NO meta + GBK bytes: walks EUC with Hangul-row ratio well under
    // 0.9 → lands on the GBK branch, not EUC-KR
    GCase("enc_gbk_nometa", "http://fixtures.test/enc/gbknometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>中文测试文本内容这是一个测试页面 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("GBK"),
      mustContain = Seq("中文测试", "zw1")),
    // NO meta + EUC-KR bytes: every pair lead sits in the Hangul rows
    // 0xB0-0xC8 (ratio 1.0 ≥ 0.9) → EUC-KR wins over the GBK superset
    GCase("enc_euckr_nometa", "http://fixtures.test/enc/euckrnometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>한국어 시험 문서입니다 가나다라 마바사 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("EUC-KR"),
      mustContain = Seq("한국어", "zw1")),
    // NO meta + EUC-JP bytes: kana rows 0xA4/0xA5 dominate (≥30%) →
    // the r05 EUC-JP branch decodes it where r04 produced EUC-KR/GBK
    // mojibake (VERDICT r04 task 3)
    GCase("enc_eucjp_nometa", "http://fixtures.test/enc/eucjpnometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>これは日本語のテストです記事本文 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("EUC-JP"),
      mustContain = Seq("日本語のテスト", "zw1")),
    // NO meta + Big5 bytes incl. a low-trail pair (一 = 0xA4 0x40, which
    // breaks the EUC walk): the r05 Big5 branch decodes it before the
    // GBK superset can claim the stream (VERDICT r04 task 3)
    GCase("enc_big5_nometa", "http://fixtures.test/enc/big5nometa",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>中文測試內容這是一個測試頁面 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("Big5"),
      mustContain = Seq("中文測試", "一個", "zw1")),
    // PINNED DEVIATION #1 (VERDICT r05 task 5; SURVEY §0.1): kana-free
    // all-kanji EUC-JP — no SS2/SS3, 0% kana rows, Hangul-row lead ratio
    // 0.76 < 0.9, no low trails — falls through EUC-JP/EUC-KR/Big5 and
    // lands on GBK (double-high majority). The mojibake below is that
    // CURRENT verdict frozen: a cascade refactor that silently moves this
    // rare corner (the right answer would be EUC-JP) now fails loudly.
    GCase("enc_eucjp_kanji_gbk_pin", "http://fixtures.test/enc/eucjpkanji",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>日本語試験記事本文内容演習問題文章構造解析結果報告書類提出期限厳守 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("EUC-JP"),
      mustContain = Seq("泣塑胳活", "zw1"), // the EUC-JP bytes read as GBK
      mustNotContain = Seq("日本語試験")),
    // PINNED DEVIATION #2 (VERDICT r05 task 5; SURVEY §0.1): GBK text
    // dominated by low-trail GBK/4 extension hanzi (outside GB2312) —
    // every pair walks Big5 (lead A1-F9, trail 40-7E) and the ≥1-low-
    // trail rule fires, so Big5 claims the stream before the GBK branch
    // can. CURRENT verdict frozen as Big5 mojibake.
    GCase("enc_gbk_lowtrail_big5_pin", "http://fixtures.test/enc/gbklowtrail",
      ("<html><head><title>fixture</title></head><body>" +
        s"""<div class="storyblock"><p>狜狝狟狢狣狤狥狦狧狪狫狵狶狹狽狾狿猀猂猄猅猆猇猈猉猋猌猍猏猐 zw1 $WinText</p><p>$WinText</p></div>""" +
        "</body></html>").getBytes("GBK"),
      mustContain = Seq("昇服朋杭", "zw1"), // the GBK bytes read as Big5
      mustNotContain = Seq("狜狝狟狢"))
  )

  // ---------------------------------------------------------- degenerate/

  private val garbageBytes: Array[Byte] = {
    // deterministic non-UTF-8 byte soup (LCG), no external data
    var s = 0x12345678L
    Array.fill[Byte](512) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      (s >>> 33).toByte
    }
  }

  val degenerateCases: Seq[GCase] = Seq(
    c("degen_empty", "http://fixtures.test/degen/empty", "",
      mustContain = Seq("<p>Scoring error.</p>")),
    c("degen_unclosed", "http://fixtures.test/degen/unclosed",
      s"""<html><body><div class="storyblock"><p>$WinText<p>$WinText""",
      mustContain = Seq("zw1")),
    c("degen_strayclose", "http://fixtures.test/degen/strayclose",
      s"""</div></p><html><body><div class="storyblock"><p>$WinText</p></div>""",
      mustContain = Seq("zw1")),
    c("degen_attr_noval", "http://fixtures.test/degen/attr_noval",
      page(s"""<div class="storyblock" data-x>\n<p draggable>$WinText</p>\n<p>$WinText</p>\n</div>"""),
      mustContain = Seq("zw1")),
    GCase("degen_garbage", "http://fixtures.test/degen/garbage", garbageBytes)
  )

  // ================== round-3: FULL per-rule coverage ====================
  // (VERDICT r02 task 3 — every ATTR_POINTS/ATTR_STRIP rule from
  // patterns.py:48-231 gets an end-to-end page, except two rules that are
  // DEAD in the reference itself; see pointsRuleDead/stripRuleDead.)
  // Every case below is registered in an AUDIT entry; GoldenRuleAuditSpec
  // verifies against the live rule tables that (a) the target rule fires
  // on the case's class/href, (b) no OTHER points rule fires except the
  // declared same-sign co-matches, (c) strip shadowing is declared.

  /** Audit record for a per-rule points case. `attr` is "class" (the raw
    * class attribute — the spec synthesizes the classid exactly like
    * Patterns.processInner) or "href".
    */
  final case class PointsAudit(
      caseName: String,
      attr: String,
      value: String,
      ruleIdx: Int,
      allowedExtra: Set[Int] = Set.empty,
      strippedToo: Boolean = false,
      // a differential A/B carries its co-matches on BOTH candidates, so
      // an opposite-sign co-match cancels instead of confounding
      differential: Boolean = false)

  final case class StripAudit(
      caseName: String,
      attr: String, // "class" | "src" | "href" | "id"
      value: String,
      ruleIdx: Int)

  /** A positive-points rule whose classid ALSO matches a strip rule: the
    * ruled child is scored (+points decay up to the candidate) and then
    * stripped — so the ruled child sits inside the WINNER (first, boost
    * must move selection) and its jnk text must be gone from the output.
    */
  private def boostViaChildCase(name: String, ruleClass: String): GCase =
    c(s"points_$name", s"http://fixtures.test/points/$name",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<div class="$ruleClass"><p>jnk child block filler</p></div>\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<div class="plainchild"><p>pad child block filler</p></div>\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0", "jnk"))

  /** Negative-points + strip-shadowed: ruled child inside the LOSER
    * (last, penalty must move selection); neutral twin child in the
    * winner keeps leaf-block noise symmetric.
    */
  private def penaltyViaChildCase(name: String, ruleClass: String): GCase =
    c(s"points_$name", s"http://fixtures.test/points/$name",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<div class="plainchild"><p>pad child block filler</p></div>\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<div class="$ruleClass"><p>jnk child block filler</p></div>\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0", "jnk"))

  /** Differential A/B for a rule whose match string unavoidably co-fires a
    * LARGER opposite-sign rule (e.g. 'post date' -5 always co-fires
    * 'post…' +10): both candidates carry the shared rule; only the loser
    * carries the target — the winner (FIRST) winning isolates the target's
    * delta.
    */
  private def diffCase(name: String, winClass: String, loseClass: String): GCase =
    c(s"points_$name", s"http://fixtures.test/points/$name",
      page(
        s"""<div class="wrapone"><div class="$winClass">\n${threeParas(WinText)}\n</div></div>\n<div class="wraptwo"><div class="$loseClass">\n${threeParas(LoseText)}\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0"))

  /** A/B for an href points rule (all are penalties): both candidates
    * carry 3 out-of-domain anchors (+1 each, C6), only the loser's hrefs
    * match the rule — the same shape as the round-2 jshref case.
    */
  private def hrefPenaltyCase(name: String, mkHref: Int => String): GCase =
    c(s"points_$name", s"http://fixtures.test/points/$name",
      page(
        s"""<div class="plain">\n${threeParas(WinText)}\n<a href="http://other1.test/x">extlink</a> <a href="http://other2.test/x">extlink</a> <a href="http://other3.test/x">extlink</a>\n</div>\n<div class="plain2">\n${threeParas(LoseText)}\n<a href="${mkHref(1)}">extlink</a> <a href="${mkHref(2)}">extlink</a> <a href="${mkHref(3)}">extlink</a>\n</div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0"))

  // (caseSuffix, AttrPoints index, raw class, allowed same-direction
  // co-matching rule indices) — sign read from the live table.
  private val r3PointsClassRules: Seq[(String, Int, String, Set[Int])] = Seq(
    ("ghost_word", 3, "ghost-pane", Set.empty[Int]),
    ("itempanel_word", 4, "panel-3", Set.empty[Int]),
    ("topics_word", 7, "topic-list", Set.empty[Int]),
    ("social_any", 10, "socialite", Set.empty[Int]), // reAny hits the substring; \bsocial\b strip does NOT
    ("ad_word", 11, "promo-ad-box", Set.empty[Int]),
    ("bottom_word", 12, "bottom-zone", Set.empty[Int]),
    ("dontprint_word", 13, "dontprint", Set.empty[Int]),
    ("footer_word", 14, "non-footer", Set.empty[Int]), // strip foot(er) blocked by its (?<!non ) lookbehind
    ("global_word", 15, "global-area", Set.empty[Int]),
    ("hotspot_word", 16, "hotspot", Set.empty[Int]),
    ("more_word", 20, "more-zone", Set.empty[Int]),
    ("site_word", 22, "site-area", Set.empty[Int]),
    ("embed_any", 24, "embedbox", Set.empty[Int]),
    ("extras_word", 25, "extras", Set.empty[Int]),
    ("main_word", 27, "main-area", Set.empty[Int]),
    ("text_word", 28, "text", Set.empty[Int]),
    ("article_word", 29, "the-article-zone", Set.empty[Int]),
    ("article_prefix", 30, "articlewrap", Set.empty[Int]),
    ("gallery_any", 31, "gallerybox", Set.empty[Int]),
    ("photo_any", 32, "photobox", Set.empty[Int]),
    ("mainimg_whole", 33, "mainimg", Set.empty[Int]),
    ("page_whole", 35, "page", Set.empty[Int]),
    ("readme_whole", 36, "readme", Set.empty[Int]),
    ("content_word", 38, "content-zone", Set.empty[Int]),
    ("primarycol_word", 39, "primary-column", Set.empty[Int]),
    ("memeimage_whole", 44, "meme-image-holder", Set.empty[Int]),
    ("video_word", 47, "video-pane", Set.empty[Int]),
    ("snappreview_word", 49, "snap-preview", Set.empty[Int]),
    ("postnum_whole", 52, "post-7", Set(48)),          // 'post 7' necessarily also fires word-'post…' (+10, same sign)
    ("articlespan_whole", 53, "article-span-image", Set(29, 30)), // whole necessarily starts with 'article'
    ("largeimage_whole", 55, "large-image", Set.empty[Int]),
    ("player_whole", 57, "player", Set(47))            // whole 'player' necessarily fires word-(player|video) (+10, same sign)
  )

  // strip-shadowed points rules: same string is a strip rule too, so the
  // evidence is via a scored-then-stripped CHILD of the candidate.
  private val r3PointsViaChild: Seq[(String, Int, String)] = Seq(
    ("icons_word", 17, "icons"),                        // -5; strip reWord(icons) shadows
    ("moreatboingboing_whole", 45, "moreatboingboing")  // +10; strip reWhole(previously|moreatboingboing) shadows
  )

  // (caseSuffix, AttrPoints index, href template, allowed co-matches)
  private val r3PointsHrefRules: Seq[(String, Int, Int => String, Set[Int])] = Seq(
    ("href_delicious", 58, i => s"http://delicious.com/post?url=http://x$i.test/", Set.empty[Int]),
    ("href_submit", 59, i => s"http://digg.com/submit?url=x$i", Set.empty[Int]),
    ("href_fbshare", 60, i => s"http://www.facebook.com/share.php?u=x$i", Set(74)), // 'share.php' also fires word-share (-3, same sign)
    ("href_buzz", 61, i => s"http://www.newsvine.com/buzz/x$i", Set.empty[Int]),
    ("href_addthis", 63, i => s"http://www.addthis.com/bookmark.php?url=x$i", Set.empty[Int]),
    ("href_tweetmeme", 64, i => s"http://api.tweetmeme.com/share?url=x$i", Set(74)),
    ("href_diggthis", 65, i => s"http://digg.com/tools/diggthis?u=x$i", Set.empty[Int]),
    ("href_fark", 66, i => s"http://cgi.fark.com/cgi/farkit.pl?u=x$i", Set.empty[Int]),
    ("href_furl", 67, i => s"http://furl.net/storeIt.jsp?u=x$i", Set.empty[Int]),
    ("href_fusion", 68, i => s"http://fusion.google.com/add?feedurl=x$i", Set.empty[Int]),
    ("href_gbookmark", 69, i => s"http://www.google.com/bookmarks/mark?u=x$i", Set.empty[Int]),
    ("href_myshare", 70, i => s"http://myshare.url.com/save?u=x$i", Set.empty[Int]),
    ("href_nvtools", 71, i => s"http://www.newsvine.com/_tools/seed?u=x$i", Set.empty[Int]),
    ("href_pheedo", 72, i => s"http://www.pheedo.com/click.phdo?i=x$i", Set.empty[Int]),
    ("href_twstatus", 73, i => s"http://twitter.com/home?status=x$i", Set.empty[Int]),
    ("href_share_word", 74, i => s"http://other$i.test/share/x", Set.empty[Int]),
    ("href_sponsor_word", 75, i => s"http://other$i.test/sponsor/x", Set.empty[Int]),
    ("href_feedads", 76, i => s"http://feedads.g.doubleclick.net/x$i", Set.empty[Int])
  )
  // href_feedads: the anchors are ALSO href-strip-rule 83 targets — scored
  // (-2 decays up) then stripped; declared in the audit below.

  val r3PointsCases: Seq[GCase] =
    r3PointsClassRules.map { case (suffix, idx, cls, _) =>
      if (graft.kernel.Patterns.AttrPoints(idx)._1 > 0) boostCase(suffix, cls)
      else penaltyCase(suffix, cls)
    } ++
      r3PointsViaChild.map { case (suffix, idx, cls) =>
        if (graft.kernel.Patterns.AttrPoints(idx)._1 > 0) boostViaChildCase(suffix, cls)
        else penaltyViaChildCase(suffix, cls)
      } ++
      r3PointsHrefRules.map { case (suffix, _, mk, _) => hrefPenaltyCase(suffix, mk) } :+
      // -5 'post date' always co-fires +10 word-'post…': differential A/B
      diffCase("postdate_diff", "blog-post", "blog-post-date")

  val r3PointsAudits: Seq[PointsAudit] =
    r3PointsClassRules.map { case (suffix, idx, cls, extra) =>
      PointsAudit(s"points_$suffix", "class", cls, idx, extra)
    } ++
      r3PointsViaChild.map { case (suffix, idx, cls) =>
        PointsAudit(s"points_$suffix", "class", cls, idx, strippedToo = true)
      } ++
      r3PointsHrefRules.map { case (suffix, idx, mk, extra) =>
        PointsAudit(s"points_$suffix", "href", mk(1), idx, extra,
          strippedToo = idx == 76)
      } ++ Seq(
        PointsAudit("points_postdate_diff", "class", "blog-post-date", 21, Set(48),
          differential = true),
        // the diff case's WINNER class must fire ONLY the shared +10 rule
        PointsAudit("points_postdate_diff#win", "class", "blog-post", 48)
      )

  // (caseSuffix, AttrStrip index, raw class)
  private val r3StripClassRules: Seq[(String, Int, String)] = Seq(
    ("addthis_any", 1, "addthis"),
    ("disqus_any", 3, "disqus-thread"),
    ("functions_any", 4, "functions"),
    ("popular_any", 5, "popular"),
    ("reportabuse_any", 7, "reportabuse"),
    ("sharebar_any", 8, "sharebar"),
    ("signin_any", 9, "signin"),
    ("textad_any", 10, "text-ad"),
    ("toolbox_any", 11, "toolbox"),
    ("adblock_word", 14, "adblock"),
    ("cnnftr_word", 17, "cnn_ftrcntnt"),
    ("cnnstry_word", 18, "cnn_strybtmcntnt"),
    ("fblike_word", 19, "facebook-like"),
    ("foot_word", 20, "footer"),
    ("horizposts_word", 22, "horizontal-posts"),
    ("icons_word", 23, "icons"),
    ("ilikethis_word", 24, "ilikethis"),
    ("metavalue_word", 26, "metavalue"),
    ("morearticles_word", 27, "more-articles"),
    ("postlabels_word", 28, "post-labels"),
    ("postshare_word", 29, "post-share"),
    ("postmetadata_word", 30, "postmetadata"),
    ("relatedtopics_word", 33, "relatedtopics"),
    ("retweet_word", 35, "retweet"),
    ("shopbox_word", 36, "shopbox"),
    ("siteheader_word", 37, "siteheader"),
    ("snapnopreview_word", 38, "snap-nopreview"),
    ("wdtbutton_word", 42, "wdt_button"),
    ("ads_whole", 44, "ad"),
    ("articlebreak_whole", 45, "article-break"),
    ("articleinline_whole", 46, "article-inline-runaround-left"),
    ("authorinfo_whole", 47, "author-info"),
    ("blipprnobr_whole", 48, "blippr-nobr"),
    ("catsandtags_whole", 50, "catsandtags"),
    ("dontprint_whole", 51, "dont-print"),
    ("feedflare_whole", 52, "feedflare"),
    ("morestories_whole", 53, "more-stories"),
    ("postedby_whole", 55, "postedby"),
    ("prevnext_whole", 56, "prevnext"),
    ("previously_whole", 57, "previously2"),
    ("promocolumn_whole", 58, "promocolumn"), // the rule text is 'promoColumn' but camelCase class splits in classid; all-lower matches (same in the reference)
    ("recentposts_whole", 59, "recent-posts"),
    ("rightrail_whole", 61, "rightrail"),
    ("seealso_whole", 63, "seealso"),
    ("sexybookmarks_whole", 64, "sexy-bookmarks"),
    ("sociable_whole", 67, "sociable"),
    ("storydate_whole", 68, "story-date"),
    ("notes_whole", 69, "notes"),
    ("postdetails_whole", 70, "post-details"),
    ("scribol_whole", 80, "scribol")
  )

  // src/href/id strip rules: junk node with the matching attribute; the
  // marker is a distinctive substring of the junk node's own markup.
  private val r3StripAttrRules: Seq[(String, Int, String, Seq[String])] = Seq(
    ("invitemedia_src", 72,
      """<img src="http://ad.invitemedia.com/jnk.gif" width="300" height="250">""",
      Seq("jnk")),
    ("leenks_src", 74,
      """<img src="http://www.leenks.com/webmasters/jnk.gif" width="120" height="60">""",
      Seq("jnk")),
    ("reddit_src", 75,
      """<img src="http://www.reddit.com/static/jnk.png" width="70" height="20">""",
      Seq("jnk")),
    ("stumbleupon_src", 76,
      """<img src="http://cdn.stumbleupon.com/jnk.png" width="16" height="16">""",
      Seq("jnk")),
    ("onebyone_src", 77,
      """<img src="http://fixtures.test/img/1x1.trans.gif" width="1" height="1">""",
      Seq("1x1.trans")),
    ("hashid_id", 79,
      """<div id="abcdefghijklmnopqrstuvwxyz0123456789a#1234567890123456"><p>this jnk block must be stripped</p></div>""",
      Seq("jnk")),
    ("qmgif_src", 82,
      """<img src="http://fixtures.test/social/qm.gif" width="10" height="10">""",
      Seq("qm.gif")),
    ("feedproxy_href", 84,
      """<a href="http://feedproxy.google.com/~r/jnkblog/art1">jnk feed link</a>""",
      Seq("jnk")),
    ("feedproxy_src", 85,
      """<img src="http://feedproxy.google.com/1.0/jnk.gif" width="80" height="15">""",
      Seq("jnk"))
  )

  val r3StripCases: Seq[GCase] =
    r3StripClassRules.map { case (suffix, _, cls) => stripClassCase(suffix, cls) } ++
      r3StripAttrRules.map { case (suffix, _, junk, markers) =>
        val base = stripCase(suffix, junk)
        base.copy(mustNotContain = markers)
      }

  val r3StripAudits: Seq[StripAudit] =
    r3StripClassRules.map { case (suffix, idx, cls) =>
      StripAudit(s"strip_$suffix", "class", cls, idx)
    } ++ Seq(
      StripAudit("strip_invitemedia_src", "src", "http://ad.invitemedia.com/jnk.gif", 72),
      StripAudit("strip_leenks_src", "src", "http://www.leenks.com/webmasters/jnk.gif", 74),
      StripAudit("strip_reddit_src", "src", "http://www.reddit.com/static/jnk.png", 75),
      StripAudit("strip_stumbleupon_src", "src", "http://cdn.stumbleupon.com/jnk.png", 76),
      StripAudit("strip_onebyone_src", "src", "http://fixtures.test/img/1x1.trans.gif", 77),
      StripAudit("strip_hashid_id", "id", "abcdefghijklmnopqrstuvwxyz0123456789a#1234567890123456", 79),
      StripAudit("strip_qmgif_src", "src", "http://fixtures.test/social/qm.gif", 82),
      StripAudit("strip_feedproxy_href", "href", "http://feedproxy.google.com/~r/jnkblog/art1", 84),
      StripAudit("strip_feedproxy_src", "src", "http://feedproxy.google.com/1.0/jnk.gif", 85)
    )

  // C5 tag-name scores and the TagSize edge semantics (util.py:197-213)
  val r3StructuralCases: Seq[GCase] = Seq(
    // C5: <article> itself scores +10 — the article element (FIRST) beats
    // an identical plain div
    c("structure_article_tag", "http://fixtures.test/structure/article_tag",
      page(
        s"""<div class="wrapone"><article class="plain">\n${threeParas(WinText)}\n</article></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C5: <section> scores +1
    c("structure_section_tag", "http://fixtures.test/structure/section_tag",
      page(
        s"""<div class="wrapone"><section class="plain">\n${threeParas(WinText)}\n</section></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // TagSize: width/height "100%" count as 600×400 = 240 000 px ⇒ +3
    // (but NOT the ≥250 000 +4); the 200×200 img (40 000 px) scores 0
    c("images_pct_size", "http://fixtures.test/images/pct_size",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<img src="/i/p.jpg" width="100%" height="100%" alt="p">\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<img src="/i/q.jpg" width="200" height="200" alt="q">\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // TagSize: style="width: Npx; height: Npx" is honored when the
    // width/height attrs are absent (640×480 ⇒ +3+4)
    c("images_style_size", "http://fixtures.test/images/style_size",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<img src="/i/s.jpg" style="width: 640px; height: 480px" alt="s">\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<img src="/i/t.jpg" alt="t">\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // TagSize: ANY dimension < 25 forces size = 1 (≤625 ⇒ −1.5), even when
    // the other dimension is huge (20×900 is NOT 18 000 px)
    c("images_tiny_one", "http://fixtures.test/images/tiny_one",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<img src="/i/u.jpg" width="200" height="200" alt="u">\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<img src="/i/v.jpg" width="20" height="900" alt="v">\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C7: leaf text > 250 chars adds +4 on top of the >50 +3
    c("blocks_gt250_bonus", "http://fixtures.test/blocks/gt250",
      page({
        val a = "zw1 " + ("a" * 247) // 251 chars: +3 +4
        val b = "zl0 " + ("b" * 245) // 249 chars: +3
        s"""<div class="wrapone"><div class="plain"><p>$a</p><p>$a</p><p>$a</p></div></div>\n<div class="wraptwo"><div class="plain2"><p>$b</p><p>$b</p><p>$b</p></div></div>"""
      }),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0")),
    // C7: a leaf block whose only content is an anchor (textLen 0, no img)
    // scores −2 (net −1 after the +1 out-of-domain link bonus)
    c("blocks_empty_anchor", "http://fixtures.test/blocks/empty_anchor",
      page(
        s"""<div class="wrapone"><div class="plain">\n${threeParas(WinText)}\n<p></p><p></p><p></p>\n</div></div>\n<div class="wraptwo"><div class="plain2">\n${threeParas(LoseText)}\n<p><a href="http://other1.test/e">x</a></p><p><a href="http://other2.test/e">x</a></p><p><a href="http://other3.test/e">x</a></p>\n</div></div>"""),
      mustContain = Seq("zw1"), mustNotContain = Seq("zl0"))
  )

  /** Coverage ledger: every AttrPoints index → the golden case that
    * evidences it (or an entry in pointsRuleDead). GoldenRuleAuditSpec
    * asserts the union is exactly 0 until 77.
    */
  val pointsRuleLedger: Map[Int, String] = Map(
    0 -> "points_side_whole", 1 -> "points_email_word", 2 -> "points_twitter_word",
    5 -> "points_overlay_word", 6 -> "points_print_word", 8 -> "points_biobox_whole",
    9 -> "points_menu_any", 18 -> "points_lightbox_word", 19 -> "points_links_word",
    23 -> "points_reltag", 26 -> "points_meta_word", 34 -> "points_permalink_whole",
    37 -> "points_bodytext_word", 40 -> "points_single_word", 41 -> "points_articlecopy",
    42 -> "points_entry_word", 46 -> "points_story_whole", 48 -> "points_postbody_word",
    50 -> "points_wide_word", 51 -> "points_meat_whole", 54 -> "points_hentry",
    56 -> "points_storyblock", 62 -> "points_jshref",
    21 -> "points_postdate_diff"
  ) ++ r3PointsClassRules.map { case (s, i, _, _) => i -> s"points_$s" }.toMap ++
    r3PointsViaChild.map { case (s, i, _) => i -> s"points_$s" }.toMap ++
    r3PointsHrefRules.map { case (s, i, _, _) => i -> s"points_$s" }.toMap

  /** Rules that are DEAD IN THE REFERENCE: classid synthesis
    * (patterns.py:251-269 separate_words) replaces '-' and '_' with
    * spaces BEFORE matching, so patterns containing a literal hyphen or
    * underscore can never fire. Replicated faithfully; no golden page can
    * exercise them (in the reference either).
    */
  val pointsRuleDead: Map[Int, String] = Map(
    43 -> "reWord('usertext-body'): hyphen cannot survive separate_words (patterns.py:92)")

  val stripRuleLedger: Map[Int, String] = Map(
    0 -> "strip_adsense_any", 2 -> "strip_comment_word", 12 -> "strip_nav_word",
    13 -> "strip_authorbox_word", 15 -> "strip_archive_word", 16 -> "strip_byline_word",
    21 -> "strip_hidden_word", 25 -> "strip_logo_word", 31 -> "strip_readmore_word",
    32 -> "strip_related_word", 34 -> "strip_replies_word", 39 -> "strip_social_word",
    40 -> "strip_tags_word", 41 -> "strip_talkback_word", 43 -> "strip_widget_word",
    49 -> "strip_breadcrumb_whole", 54 -> "strip_pagination_whole",
    60 -> "strip_respond_whole", 62 -> "strip_searchbar_whole",
    65 -> "strip_share_whole", 66 -> "strip_sidebar_whole",
    71 -> "strip_doubleclick_src", 73 -> "strip_quantserve_src",
    78 -> "strip_smilies_src", 81 -> "strip_display_none", 83 -> "strip_feedads_href"
  ) ++ r3StripClassRules.map { case (s, i, _) => i -> s"strip_$s" }.toMap ++
    r3StripAttrRules.map { case (s, i, _, _) => i -> s"strip_$s" }.toMap

  val stripRuleDead: Map[Int, String] = Map(
    6 -> "reAny('^post_(\\d+_)?info'): underscores cannot survive separate_words (patterns.py:136)")

  val all: Seq[GCase] =
    pointsCases ++ stripCases ++ mungeCases ++ routeCases ++
      structuralCases ++ encodingCases ++ degenerateCases ++
      r3PointsCases ++ r3StripCases ++ r3StructuralCases

  val byName: Map[String, GCase] = all.map(g => g.name -> g).toMap
}
