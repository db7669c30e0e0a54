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
            mungeHyphenate(tag)
            mungeNoscript(tag)
            tag.serialized
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

  /** clean.py:288-309 (M4) — strip empty tags, cascading to parents. */
  def mungeStripEmpties(root: Elem): Unit = {
    def stripIfEmpty(tag: Elem): Unit = {
      if (tag == null || !EmptyStripTags.contains(tag.name)) return
      if (Py.strip(tag.text).nonEmpty) return
      if (tag.find((e: Elem) => e.name != "br" && e.name != "hr") != null)
        return
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
  def mungeStripAttrs(root: Elem): Unit = {
    for (tag <- root.findAll((_: Elem) => true); attr <- StripAttrs)
      tag.delAttr(attr)
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
    for (t <- parent.findAll((e: Elem) => e.hasAttr("href"))) fix(t, "href")
    if (parent.hasAttr("href")) fix(parent, "href")
    for (t <- parent.findAll((e: Elem) => e.hasAttr("src"))) fix(t, "src")
    if (parent.hasAttr("src")) fix(parent, "src")
    for (t <- parent.findAll((e: Elem) => e.name == "object" && e.hasAttr("data")))
      fix(t, "data")
    if (parent.name == "object" && parent.hasAttr("data")) fix(parent, "data")
    for (t <- parent.findAll((e: Elem) =>
           e.name == "param" && e.attr("name") == "movie" && e.hasAttr("value")))
      fix(t, "value")
    if (parent.name == "param" && parent.attr("name") == "movie" &&
        parent.hasAttr("value")) fix(parent, "value")
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

  private val ReEntitySplit = Pattern.compile("&[^;]{2,6};")
  private val SoftHyphen = "­"

  /** clean.py:223-241 (M11) — hyphenate every text node outside <pre>;
    * entity-looking runs pass through; whitespace collapses to single
    * spaces. NB replaces Comment nodes with plain text (reference quirk on
    * non-generic paths where comments survive).
    */
  def mungeHyphenate(root: Elem): Unit = {
    for (text <- root.findTexts) {
      if (text.findParent(Set("pre")) == null) {
        val s = text.data
        val out = new StringBuilder
        // re.split(r'(&[^;]{2,6};)', s) with captured separators:
        val m = ReEntitySplit.matcher(s)
        var pos = 0
        val parts = mutable.ArrayBuffer.empty[String]
        while (m.find()) {
          parts += s.substring(pos, m.start())
          parts += s.substring(m.start(), m.end())
          pos = m.end()
        }
        parts += s.substring(pos)
        for (part <- parts if part.nonEmpty) {
          if (part.charAt(0) == '&') out.append(part)
          else {
            val words = splitPyWhitespace(part)
            out.append(words.map(w =>
              Hyphenate.hyphenateWord(w).mkString(SoftHyphen)).mkString(" "))
          }
        }
        text.replaceWith(new Text(out.toString))
      }
    }
  }

  /** Python re.split(r'\s+', s) — unicode whitespace; leading separator
    * yields an initial empty string.
    */
  private def splitPyWhitespace(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inWs = false
    var first = true
    for (c <- s) {
      if (Py.isSpace(c)) {
        if (!inWs) {
          out += cur.toString; cur.clear(); inWs = true
        }
      } else {
        cur.append(c); inWs = false; first = false
      }
    }
    out += cur.toString
    out.toSeq
  }

  /** clean.py:270-272 (M12) */
  def mungeNoscript(root: Elem): Unit =
    for (tag <- root.findAll("noscript")) tag.name = "div"
}
