package graft.kernel

import java.util.regex.Pattern
import scala.collection.mutable

/** Post-selection cleanup — port of the reference's readability/clean.py
  * munge pipeline (M1-M13, SURVEY.md §2.7). Pass order is normative
  * (clean.py:193-220). DEBUG=False attr stripping (clean.py:64-70).
  */
object Munge {

  private val FLAGS = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE

  /** clean.py:42-43 */
  val ReAligned: Pattern =
    Pattern.compile("(?:_|\\b)(?:align|float:\\s*)?(left|right)(?:_|\\b)", FLAGS)

  /** clean.py:44-70 — note the 'onchange ' trailing-space quirk: a real
    * `onchange` attr is never stripped (SURVEY.md §0.1).
    */
  val StripAttrs: Seq[String] = Seq(
    "onblur", "onchange ", "onclick", "ondblclick", "onfocus", "onkeydown",
    "onkeypress", "onkeyup", "onload", "onmousedown", "onmousemove",
    "onmouseout", "onmouseover", "onmouseup", "onreset", "onselect",
    "onsubmit", "onunload",
    // DEBUG=False additions:
    "class", "id", "classid", "score")

  /** clean.py:193-220 — returns the serialized munged selection. */
  def munge(soup: Elem, selected: Extract.Selected, url: String): String = {
    selected match {
      case Extract.SelStr(s) => s
      case Extract.SelNode(node) =>
        node match {
          case tag0: Elem =>
            var tag = tag0
            mungeStripSiteSpecific(tag, url)
            mungeStripBrsAfterPs(tag)
            mungeStripRules(tag)
            mungeStripEmpties(tag)
            tag = mungeStripRootContainers(tag)
            mungeStripLowScored(tag)
            mungeStripAttrs(tag)
            fixUrls(tag, url)
            mungeImages(tag)
            mungeHeaderDowngrade(tag)
            mungeNoscript(tag)
            // M11+M13 fused: hyphenation applied at serialize time (no
            // findTexts pass, no per-node replaceWith) — byte-equivalent
            // to mungeHyphenate-then-serialize, spec'd in MungeSpec.
            // Presized buffer: the default 16-char builder doubles ~10
            // times for a typical article (repeated array copies).
            val sb = new StringBuilder(1 << 14)
            serializeHyphenated(tag, sb)
            sb.toString
          case t => t.serialized // text selection (defensive)
        }
    }
  }

  /** clean.py:335-338 (M1/X8) */
  def mungeStripSiteSpecific(root: Elem, url: String): Unit = {
    if (url.contains("smashingmagazine.com")) {
      for (t <- root.findAll((e: Elem) =>
             e.name == "table" && e.attr("width") == "650"))
        Patterns.strip(t)
    }
  }

  /** clean.py:281-285 (M2) */
  def mungeStripBrsAfterPs(root: Elem): Unit = {
    for (tag <- root.findAll("p")) {
      val next = tag.findNextSibling()
      if (next != null && next.name == "br") Patterns.strip(next)
    }
  }

  /** clean.py:327-332 (M3) — strip trailing <hr>s; a trailing string node
    * ends the loop (the reference's AttributeError guard).
    */
  def mungeStripRules(root: Elem): Unit = {
    var continue = true
    while (continue) {
      root.children.lastOption match {
        case Some(e: Elem) if e.name == "hr" => Patterns.strip(e)
        case _ => continue = false
      }
    }
  }

  private val EmptyStripTags = Set(
    "a", "center", "div", "li", "ol", "p", "table", "td", "th", "tr",
    "span", "ul", "h1", "h2", "h3", "h4", "h5", "h6")

  /** "Keep" test for the empties cascade, fused into ONE early-exit
    * recursive walk (clean.py:288-309 runs two subtree passes per
    * candidate: `strip(tag.text)` and `tag.find(lambda ...)`) — a tag
    * survives iff it has a visible non-space text descendant OR any elem
    * descendant that isn't br/hr.  Pure predicate, so the OR order is
    * immaterial; fusing avoids two iterator constructions per candidate
    * (r03 profile: this cascade was the heaviest munge slice).
    */
  private def mustKeepNonEmpty(tag: Elem): Boolean = {
    val cs = tag.children
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case e: Elem =>
          if (e.name != "br" && e.name != "hr") return true
          if (mustKeepNonEmpty(e)) return true
        case t: Text if t.visible =>
          val d = t.data
          var j = 0
          val m = d.length
          while (j < m) {
            if (!Py.isSpace(d.charAt(j))) return true
            j += 1
          }
        case _ =>
      }
      i += 1
    }
    false
  }

  /** clean.py:288-309 (M4) — strip empty tags, cascading to parents. */
  def mungeStripEmpties(root: Elem): Unit = {
    def stripIfEmpty(tag: Elem): Unit = {
      if (tag == null || !EmptyStripTags.contains(tag.name)) return
      if (mustKeepNonEmpty(tag)) return
      val parent = tag.parent
      Patterns.strip(tag)
      stripIfEmpty(parent)
    }
    for (tag <- root.findAll(EmptyStripTags)) stripIfEmpty(tag)
  }

  /** clean.py:312-315 (M6) */
  def mungeStripLowScored(root: Elem): Unit = {
    for (tag <- root.findAll((e: Elem) => e.attrs.contains("score"))) {
      if (tag.hasScore && tag.score <= -2) Patterns.strip(tag)
    }
  }

  /** clean.py:318-324 (M5) — descend through single-child containers. */
  def mungeStripRootContainers(root: Elem): Elem = {
    val childTags = root.childElems
    if (childTags.length != 1) return root
    if (Py.strip(root.childTexts.map(_.data).mkString("")).nonEmpty)
      return root
    mungeStripRootContainers(childTags.head)
  }

  /** clean.py:275-278 (M7) — descendants only: the selection root keeps its
    * attrs (root_tag.findAll(True) excludes the root — reference quirk,
    * observable in production output; replicated).
    */
  private val StripAttrSet: Set[String] = StripAttrs.toSet

  def mungeStripAttrs(root: Elem): Unit = {
    // iterate the attrs PRESENT on each tag (usually 0-3) instead of
    // probing all 22 strip keys per tag; same removals ('onchange ' can
    // never be a parsed attr name, so the trailing-space quirk holds)
    for (tag <- root.descendants) tag match {
      case e: Elem if e.attrs.nonEmpty =>
        var doomed: List[String] = Nil
        for (k <- e.attrs.keysIterator)
          if (StripAttrSet.contains(k)) doomed = k :: doomed
        doomed.foreach(e.delAttr)
      case _ =>
    }
  }

  /** clean.py:169-190 (M8) — absolutize href/src/object-data/param-movie,
    * root tag included.
    */
  def fixUrls(parent: Elem, baseUrl: String): Unit = {
    def fix(tag: Elem, attr: String): Unit = {
      val v = tag.attr(attr)
      if (v == null) return
      try tag.setAttr(attr, Py.urljoin(baseUrl, Py.strip(v)))
      catch { case _: Exception => } // ValueError path: leave as-is
    }
    // one traversal applying all four selectors (the reference runs four
    // findAll passes, clean.py:169-190, but the fixes touch DISJOINT attrs
    // and never mutate the tree shape, so per-node fusion is
    // order-equivalent)
    def fixNode(t: Elem): Unit = {
      if (t.hasAttr("href")) fix(t, "href")
      if (t.hasAttr("src")) fix(t, "src")
      if (t.name == "object" && t.hasAttr("data")) fix(t, "data")
      if (t.name == "param" && t.attr("name") == "movie" && t.hasAttr("value"))
        fix(t, "value")
    }
    for (n <- parent.descendants) n match {
      case e: Elem => fixNode(e)
      case _       =>
    }
    fixNode(parent)
  }

  /** clean.py:249-267 (M9) */
  def mungeImages(root: Elem): Unit = {
    for (img <- root.findAll("img") if !img.hasAttr("align")) {
      var applied = false
      if (img.hasAttr("style")) {
        val m = ReAligned.matcher(img.attr("style"))
        if (m.find()) { img.setAttr("align", m.group(1)); applied = true }
      }
      if (!applied && img.hasAttr("class")) {
        val m = ReAligned.matcher(img.attr("class"))
        if (m.find()) img.setAttr("align", m.group(1))
      }
    }
  }

  /** clean.py:244-246 (M10) */
  def mungeHeaderDowngrade(root: Elem): Unit = {
    for (tag <- root.findAll(Patterns.TagNamesHeader)) {
      val n = tag.name.charAt(1) - '0'
      tag.name = "h" + math.min(6, n + 2)
    }
  }

  private val PreOnly = Set("pre")

  /** clean.py:223-241 (M11) — hyphenate every text node outside <pre>;
    * entity-looking runs pass through; whitespace collapses to single
    * spaces. NB replaces Comment nodes with plain text (reference quirk on
    * non-generic paths where comments survive).
    *
    * Single forward scan per text node (r03 perf task): the reference's
    * `re.split(r'(&[^;]{2,6};)')` + `re.split(r'\s+')` + per-word join is
    * reproduced exactly but without Matcher/part-list/word-list
    * allocations — this pass was ~30% of munge time on realistic pages.
    */
  def mungeHyphenate(root: Elem): Unit = {
    for (text <- root.findTexts) {
      if (text.findParent(PreOnly) == null) {
        val s = text.data
        val out = hyphenateRun(s)
        // unchanged plain Text nodes can stay in place; subclasses
        // (Comment/RawText) must still be downgraded to plain Text — the
        // reference's unicode() coercion changes their serialization
        if (out != s || text.getClass != classOf[Text])
          text.replaceWith(new Text(out))
      }
    }
  }

  /** `re.split(r'(&[^;]{2,6};)')` with captured separators, entity parts
    * verbatim, word parts whitespace-collapsed + hyphenated — as ONE scan.
    * An entity match is `&` + 2..6 non-`;` chars + `;` starting at the
    * earliest possible `&` (greedy `[^;]{2,6}` can only ever stop at the
    * first `;` or at 6 chars, so no backtracking case survives in which a
    * shorter count would match — verified against the regex semantics).
    */
  private def hyphenateRun(s: String): String = {
    val out = new StringBuilder(s.length + (s.length >> 3))
    hyphenateRunTo(s, out, esc = false)
    out.toString
  }

  /** Append-style form.  With `esc = true` every appended fragment is
    * HTML-text-escaped on the way out — escaping is char-local, so
    * per-fragment escape ≡ escapeText of the concatenation; the fused
    * serializer uses this to skip the intermediate per-text-node string +
    * second escape scan entirely.
    */
  private def hyphenateRunTo(s: String, out: StringBuilder, esc: Boolean): Unit = {
    val n = s.length
    var i = 0
    var segStart = 0
    while (i < n) {
      if (s.charAt(i) == '&') {
        var j = i + 1
        var k = 0
        while (k < 6 && j < n && s.charAt(j) != ';') { j += 1; k += 1 }
        if (k >= 2 && j < n && s.charAt(j) == ';') {
          appendHyphenatedWords(s, segStart, i, out, esc)
          appendRange(s, i, j + 1, out, esc) // the entity, untouched
          i = j + 1
          segStart = i
        } else i += 1
      } else i += 1
    }
    appendHyphenatedWords(s, segStart, n, out, esc)
  }

  /** `' '.join(hyphenate(w) for w in re.split(r'\s+', part))` for the
    * substring [from, until): each whitespace run becomes one space (a
    * leading/trailing run yields a leading/trailing space via the empty
    * first/last token, exactly like Python's split-with-leading-empty).
    * Empty parts are skipped entirely (the reference's `if part`).
    */
  private def appendHyphenatedWords(
      s: String, from: Int, until: Int, out: StringBuilder, esc: Boolean): Unit = {
    if (from >= until) return
    var i = from
    var wordStart = -1
    var inWs = false
    while (i < until) {
      if (Py.isSpace(s.charAt(i))) {
        if (wordStart >= 0) {
          appendHyphenated(s, wordStart, i, out, esc); wordStart = -1
        }
        if (!inWs) { out.append(' '); inWs = true }
      } else {
        if (wordStart < 0) wordStart = i
        inWs = false
      }
      i += 1
    }
    if (wordStart >= 0) appendHyphenated(s, wordStart, until, out, esc)
  }

  private def appendRange(
      s: String, from: Int, until: Int, out: StringBuilder, esc: Boolean): Unit = {
    // bulk java append — the (s, from, until) overload on the SCALA
    // StringBuilder auto-tuples (appends "(s,from,until)" literally)
    if (esc) Dom.escapeTextRange(s, from, until, out)
    else out.underlying.append(s, from, until)
  }

  private def appendHyphenated(
      s: String, from: Int, until: Int, out: StringBuilder, esc: Boolean): Unit = {
    if (until - from <= 4) appendRange(s, from, until, out, esc) // ≤4 never splits
    else Hyphenate.appendHyphenatedShy(s, from, until, out, esc)
  }

  /** clean.py:270-272 (M12) */
  def mungeNoscript(root: Elem): Unit =
    for (tag <- root.findAll("noscript")) tag.name = "div"

  // ---- M11+M13 fusion ------------------------------------------------
  // Serialize with hyphenation applied on the fly.  Byte-equivalent to
  // `mungeHyphenate(root)` followed by `root.serialize`, replicating the
  // reference quirks the two-pass version encodes:
  //  - EVERY string node outside <pre> (plain Text, but also Comment,
  //    RawText and Directive/ProcIn — bs4 findAll(text=True) returns all
  //    NavigableStrings) is coerced to plain text, hyphenated, and
  //    serialized ESCAPED;
  //  - string nodes with a <pre> ancestor (including ancestors ABOVE the
  //    selection root) keep their original node-type serialization.
  // The element branch must stay in lockstep with Elem.serialize
  // (score-attr float repr, void handling).

  /** Serialize `root` into `sb` with M11 hyphenation fused in. */
  def serializeHyphenated(root: Elem, sb: StringBuilder): Unit =
    serializeHyphElem(root, sb, root.findParent(PreOnly) != null)

  private def serializeHyphElem(
      e: Elem, sb: StringBuilder, inPre: Boolean): Unit = {
    if (e.isDocument) {
      val cs = e.children
      var i = 0
      while (i < cs.length) { serializeHyphNode(cs(i), sb, inPre); i += 1 }
      return
    }
    sb.append('<').append(e.name)
    e.attrs.foreachEntry { (k, v) =>
      sb.append(' ').append(k)
      if (k == "score" && e.hasScore) {
        sb.append("=\"").append(Py.floatRepr(e.score)).append('"')
      } else if (v != null) {
        sb.append("=\"")
        Dom.escapeAttr(v, sb)
        sb.append('"')
      }
    }
    if (Dom.VoidElements.contains(e.name) && e.children.isEmpty) {
      sb.append("/>")
    } else {
      sb.append('>')
      val childPre = inPre || e.name == "pre"
      val cs = e.children
      var i = 0
      while (i < cs.length) { serializeHyphNode(cs(i), sb, childPre); i += 1 }
      sb.append("</").append(e.name).append('>')
    }
  }

  private def serializeHyphNode(
      n: DNode, sb: StringBuilder, inPre: Boolean): Unit = n match {
    case el: Elem => serializeHyphElem(el, sb, inPre)
    case t: Text =>
      if (inPre) t.serialize(sb) // hyphenate pass skips pre-descendants
      else hyphenateRunTo(t.data, sb, esc = true)
  }
}
