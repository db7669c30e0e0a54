package graft.kernel

import java.util.regex.Pattern

/** Pure sub-operators of the feed path and corpus dataflow — the
  * network-free parts of readability/extract_feed.py, feed.py and
  * third_party/autorss.py (SURVEY.md §2.8, §2.9 D1/D7).
  */
object FeedLogic {

  /** extract_feed.py:49 */
  val MinFeedTextLen = 512

  /** extract_feed.py:72-73 */
  def trimQuery(url: String): String = url.split("\\?")(0)

  /** extract_feed.py:149-152 */
  def urlsMatch(url1: String, url2: String, trim: Boolean): Boolean =
    (if (trim) trimQuery(url1) else url1) == url2

  /** extract_feed.py:129-152 — F3 entry matching over (link,
    * feedburnerOriglink) pairs; first hit wins, exact before trimmed.
    */
  def findEntry(entries: Seq[(String, String)], url: String,
                finalUrl: String): Option[Int] = {
    def matching(target: String, trim: Boolean): Option[Int] = {
      entries.zipWithIndex.collectFirst {
        case ((link, orig), i)
            if (link != null && urlsMatch(link, target, trim)) ||
               (orig != null && urlsMatch(orig, target, trim)) => i
      }
    }
    matching(url, trim = false)
      .orElse(matching(finalUrl, trim = false))
      .orElse(matching(trimQuery(url), trim = true))
      .orElse(matching(trimQuery(finalUrl), trim = true))
  }

  /** util.py:133-149 — F4 content choice. contents: (type, value) pairs. */
  def feedEntryContent(contents: Seq[(String, String)],
                       summaryDetail: String, summary: String): String = {
    if (contents.nonEmpty) {
      if (contents.length == 1) return contents.head._2
      contents.find(_._1 == "text/html") match {
        case Some((_, v)) => return v
        case None         =>
      }
    }
    if (summaryDetail != null) return summaryDetail
    if (summary != null) return summary
    ""
  }

  private val ReTrailingEllipsis = Pattern.compile("\\[?\\.\\.\\.\\]?\\s*$")
  private val ReHtmlComment = Pattern.compile("<!--.*?-->", Pattern.DOTALL)

  /** extract_feed.py:103-120 — F5 quality gates + F6 cleanup. Returns the
    * processed soup, or the rejection reason (Left).
    */
  def feedContentGate(content0: String, url: String): Either[String, Elem] = {
    val content = Extract.preCleanHtml(content0)
    if (content.isEmpty) return Left("no content found")
    // NB the reference regex-strips comments with re.sub WITHOUT re.S
    // (extract_feed.py:108) — multiline comments survive into the parse and
    // are then dropped by CommentStrip.
    val html = Pattern.compile("<!--.*?-->").matcher(content).replaceAll("")
    val soup = HtmlParser.parse(html)
    Extract.commentStrip(soup)
    for (t <- soup.findAll("script")) Patterns.strip(t)
    val text = soup.text
    if (ReTrailingEllipsis.matcher(text).find()) Left("trailing ellipsis")
    else if (text.length < MinFeedTextLen)
      Left(s"text too short (${text.length})")
    else {
      Patterns.process(soup, url)
      Right(soup)
    }
  }

  /** third_party/autorss.py:18-42 — F1 feed link discovery: first
    * <link rel=alternate type=application/(rss|atom)+xml href> before
    * </head> or <body>.
    */
  def detectFeedLink(html: String): Option[String] = {
    val soup = HtmlParser.parse(html)
    val it = soup.descendants
    while (it.hasNext) {
      it.next() match {
        case e: Elem if e.name == "body" || e.name == "head" => () // scan on
        case e: Elem if e.name == "link" =>
          val rel = Option(e.attr("rel")).getOrElse("")
          val typ = Option(e.attr("type")).getOrElse("")
          if (rel.split(" ").contains("alternate") &&
              (typ == "application/rss+xml" || typ == "application/atom+xml") &&
              e.hasAttr("href"))
            return Some(e.attr("href"))
        case _ =>
      }
    }
    None
  }

  /** feed.py:142-148 — D1 entry key: base64(sha256(utf8(id or link))). */
  def entryId(id: String, link: String): String = {
    val src = if (id != null) id else link
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.util.Base64.getEncoder.encodeToString(digest)
  }

  /** feed.py:45-46,171-179 — D7 adaptive interval update. */
  val MinUpdateIntervalSec: Double = 3600.0
  val MaxUpdateIntervalSec: Double = 259200.0

  def updateInterval(current: Double, hadNewItems: Boolean): Double = {
    var f = current * (if (hadNewItems) 0.9 else 1.1)
    if (f < MinUpdateIntervalSec) f = MinUpdateIntervalSec
    if (f > MaxUpdateIntervalSec) f = MaxUpdateIntervalSec
    f
  }

  /** main.py:62 — U9 `at=` param strip. */
  def stripAtParam(url: String): String =
    Pattern.compile("\\?at=[^?&]+").matcher(url).replaceAll("")
}
