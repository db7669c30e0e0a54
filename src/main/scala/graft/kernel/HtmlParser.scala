package graft.kernel

import scala.collection.mutable

/** Streaming HTML tokenizer → Dom tree.
  *
  * Spec'd to the behavior of Python's html.parser under bs4's
  * HTMLParserTreeBuilder (the reference parses with
  * `bs4.BeautifulSoup(html, 'html.parser')`, extract_content.py:75):
  *  - tag/attr names lowercased; no implied-tag reconstruction;
  *  - stray end tags ignored; unclosed tags closed at EOF;
  *  - void elements (Dom.VoidElements) never take children;
  *  - `<x/>` self-closing honored for any tag;
  *  - script/style contents are raw text (no entity decoding, serialized
  *    unescaped), ended only by `</\s*name`;
  *  - character references decoded in text and attribute values
  *    (convert_charrefs=True), Entities.unescape semantics;
  *  - `class`/`rel` etc. normalized as whitespace-token lists;
  *  - optional strainer (bs4 SoupStrainer(attrs={'class': ...}),
  *    extract_content.py:38-40,60-61): only matching subtrees materialize —
  *    the reference's parse-time pruning (SURVEY.md §2.3 P3).
  */
object HtmlParser {

  /** Strainer: materialize subtrees whose root's `class` matches. */
  final case class ClassStrainer(re: java.util.regex.Pattern,
                                 exact: String = null) {
    def matches(classAttr: String): Boolean = {
      if (classAttr == null) return false
      val tokens = classAttr.split("\\s+").filter(_.nonEmpty)
      if (exact != null)
        tokens.contains(exact) || classAttr == exact
      else
        tokens.exists(t => re.matcher(t).find()) ||
        re.matcher(classAttr).find()
    }
  }

  private val CdataElements = Set("script", "style")
  // precompiled raw-text terminators (the per-tag Pattern.compile showed
  // up in the r03 parse profile — script/style are the only members)
  private val CdataEndRe: Map[String, java.util.regex.Pattern] =
    CdataElements.map(n => n -> java.util.regex.Pattern.compile(
      "</\\s*" + n, java.util.regex.Pattern.CASE_INSENSITIVE)).toMap

  def parse(html: String, strainer: ClassStrainer = null): Elem = {
    val doc = Dom.newDocument()
    // Logical open-tag stack: (name, elem or null when unmaterialized)
    val stack = mutable.ArrayBuffer[(String, Elem)]((Dom.DocumentName, doc))
    val textBuf = new StringBuilder

    def curElem: Elem = {
      var i = stack.length - 1
      while (i >= 0) {
        if (stack(i)._2 != null) return stack(i)._2
        i -= 1
      }
      doc
    }

    def materialized: Boolean = {
      // inside a materialized subtree (or no strainer at all)
      if (strainer == null) return true
      var i = stack.length - 1
      while (i >= 1) { // skip the document sentinel
        if (stack(i)._2 != null) return true
        i -= 1
      }
      false
    }

    def flushText(raw: Boolean = false): Unit = {
      if (textBuf.nonEmpty) {
        if (materialized) {
          val t = if (raw) new RawText(textBuf.toString)
                  else new Text(textBuf.toString)
          appendNode(t)
        }
        textBuf.clear()
      }
    }

    /** force=true for an elem that matched the strainer itself (it becomes
      * the root of a newly materialized subtree).
      */
    def appendNode(n: DNode, force: Boolean = false): Unit = {
      if (!force && !materialized) return
      val parent = curElem
      // coalesce adjacent plain-text nodes (html.parser buffers runs)
      (n, parent.children.lastOption) match {
        case (t: Text, Some(p: Text))
            if t.getClass == classOf[Text] && p.getClass == classOf[Text] =>
          p.data = p.data + t.data
        case _ => parent.append(n)
      }
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        Entities.unescapeAppend(html, i, n, textBuf)
        i = n
      } else {
        if (lt > i) Entities.unescapeAppend(html, i, lt, textBuf)
        i = lt
        if (i + 1 >= n) { textBuf.append('<'); i += 1 }
        else {
          val c1 = html.charAt(i + 1)
          if (c1 == '!') {
            if (html.startsWith("<!--", i)) {
              val end = html.indexOf("-->", i + 4)
              val (data, next) =
                if (end < 0) (html.substring(i + 4), n)
                else (html.substring(i + 4, end), end + 3)
              flushText()
              appendNode(new Comment(data))
              i = next
            } else {
              val gt = html.indexOf('>', i + 2)
              val (data, next) =
                if (gt < 0) (html.substring(i + 2), n)
                else (html.substring(i + 2, gt), gt + 1)
              flushText()
              appendNode(new Directive(data))
              i = next
            }
          } else if (c1 == '?') {
            val gt = html.indexOf('>', i + 2)
            val (data, next) =
              if (gt < 0) (html.substring(i + 2), n)
              else (html.substring(i + 2, gt), gt + 1)
            flushText()
            appendNode(new ProcIn(data))
            i = next
          } else if (c1 == '/') {
            if (i + 2 < n && isNameStart(html.charAt(i + 2))) {
              var j = i + 2
              while (j < n && !isNameEnd(html.charAt(j))) j += 1
              val name = html.substring(i + 2, j).toLowerCase
              val gt = html.indexOf('>', j)
              val next = if (gt < 0) n else gt + 1
              flushText()
              // pop to matching open tag; ignore if none
              var k = stack.length - 1
              while (k >= 1 && stack(k)._1 != name) k -= 1
              if (k >= 1) stack.remove(k, stack.length - k)
              i = next
            } else {
              // bogus end tag: html.parser treats `</...>` as comment-ish;
              // emit as literal text of '<' (tolerant fallback)
              textBuf.append('<')
              i += 1
            }
          } else if (isNameStart(c1)) {
            parseStartTag(html, i) match {
              case null =>
                textBuf.append('<'); i += 1
              case st =>
                flushText()
                val name = st.name
                val mat = materialized || (strainer != null &&
                  strainer.matches(st.attrs.get("class").map(v =>
                    if (v == null) "" else v).orNull))
                var elem: Elem = null
                if (mat) {
                  elem = new Elem(name)
                  for ((k, v) <- st.attrs) {
                    val vv =
                      if (Dom.MultiValuedAttrs.contains(k))
                        normTokens(v)
                      else v
                    elem.attrs(k) = vv
                  }
                  appendNode(elem, force = true)
                }
                val void = Dom.VoidElements.contains(name)
                if (!void && !st.selfClosing) {
                  if (CdataElements.contains(name)) {
                    // raw-text mode: until </name
                    val m = CdataEndRe(name).matcher(html)
                    val found = m.find(st.end)
                    val rawEnd = if (found) m.start() else n
                    if (rawEnd > st.end && elem != null) {
                      elem.append(new RawText(html.substring(st.end, rawEnd)))
                    }
                    if (found) {
                      val gt = html.indexOf('>', m.end())
                      i = if (gt < 0) n else gt + 1
                    } else i = n
                  } else {
                    stack += ((name, elem))
                    i = st.end
                  }
                } else i = st.end
            }
          } else {
            textBuf.append('<')
            i += 1
          }
        }
      }
    }
    flushText()
    doc
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameEnd(c: Char): Boolean =
    c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
    c == '\r' || c == '\f'

  private final class StartTag(val name: String,
                               val attrs: mutable.LinkedHashMap[String, String],
                               val selfClosing: Boolean,
                               val end: Int)

  /** Parse `<name attrs...>` starting at `<`; null if malformed/unterminated
    * (html.parser then emits the '<' as data).
    */
  private def parseStartTag(html: String, start: Int): StartTag = {
    val n = html.length
    var i = start + 1
    val nameStart = i
    while (i < n && html.charAt(i) != '>' && html.charAt(i) != '/' &&
           !isSpaceChar(html.charAt(i))) i += 1
    if (i >= n) return null
    val name = html.substring(nameStart, i).toLowerCase
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var selfClosing = false
    var done = false
    while (!done) {
      while (i < n && isSpaceChar(html.charAt(i))) i += 1
      if (i >= n) return null
      val c = html.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c == '/') {
        if (i + 1 < n && html.charAt(i + 1) == '>') {
          selfClosing = true; i += 2; done = true
        } else i += 1 // stray '/' skipped (attrfind tolerant)
      } else {
        // attribute name
        val as = i
        while (i < n && !isSpaceChar(html.charAt(i)) &&
               html.charAt(i) != '=' && html.charAt(i) != '>' &&
               html.charAt(i) != '/') i += 1
        if (i >= n) return null
        val aname = html.substring(as, i).toLowerCase
        while (i < n && isSpaceChar(html.charAt(i))) i += 1
        var avalue: String = null
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && isSpaceChar(html.charAt(i))) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            val ve = html.indexOf(q, i + 1)
            if (ve < 0) return null
            avalue = Entities.unescape(html.substring(i + 1, ve))
            i = ve + 1
          } else {
            val vs = i
            while (i < n && !isSpaceChar(html.charAt(i)) &&
                   html.charAt(i) != '>') i += 1
            avalue = Entities.unescape(html.substring(vs, i))
          }
        }
        if (aname.nonEmpty) attrs(aname) = avalue // duplicate: latest wins
      }
    }
    new StartTag(name, attrs, selfClosing, i)
  }

  private def isSpaceChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Multi-valued attr normalization: bs4 splits on whitespace into a list;
    * we store the single-space rejoin (serialization + `' '.join` parity).
    * Bare attr (null) → "" (bs4: empty list).
    */
  private def normTokens(v: String): String = {
    if (v == null) return ""
    v.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }
}
