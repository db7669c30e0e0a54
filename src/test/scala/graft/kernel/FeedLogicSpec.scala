package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Pure feed-path sub-operators (SURVEY.md §2.8 F3-F5, §2.9 D1/D7):
  * entry matching, content choice, quality gates, key derivation,
  * adaptive interval — VERDICT r01 listed these as untested.
  */
class FeedLogicSpec extends AnyFunSuite {

  test("F3 entry matching: exact beats trimmed, url beats final_url, origlink counts") {
    val entries = Seq(
      ("http://a.test/x?p=1", null),
      ("http://a.test/y", "http://orig.test/y"),
      ("http://a.test/x", null))
    // exact url match wins over trimmed (index 2 is exact for /x)
    assert(FeedLogic.findEntry(entries, "http://a.test/x", "http://f.test/x") == Some(2))
    // exact match on the queried url INCLUDING query string
    assert(FeedLogic.findEntry(entries, "http://a.test/x?p=1", "http://f.test") == Some(0))
    // feedburner_origlink matches too
    assert(FeedLogic.findEntry(entries, "http://orig.test/y", "http://f.test") == Some(1))
    // trimmed-query fallback: /x?other=2 has no exact match; TrimQuery
    // gives /x which matches entry 0's trimmed link first
    assert(FeedLogic.findEntry(entries, "http://a.test/x?other=2", "http://f.test") == Some(0))
    // no match at all
    assert(FeedLogic.findEntry(entries, "http://b.test/z", "http://b.test/z").isEmpty)
  }

  test("F4 content choice: single content, html-typed content, summary fallbacks") {
    // exactly one content entry → taken regardless of type
    assert(FeedLogic.feedEntryContent(
      Seq(("text/plain", "plain body")), "sd", "s") == "plain body")
    // several → the text/html one
    assert(FeedLogic.feedEntryContent(
      Seq(("text/plain", "p"), ("text/html", "<b>h</b>")), "sd", "s") == "<b>h</b>")
    // several, none html → summary_detail
    assert(FeedLogic.feedEntryContent(
      Seq(("text/plain", "p"), ("text/xml", "x")), "sd", "s") == "sd")
    // no contents → summary_detail, then summary, then ""
    assert(FeedLogic.feedEntryContent(Nil, "sd", "s") == "sd")
    assert(FeedLogic.feedEntryContent(Nil, null, "s") == "s")
    assert(FeedLogic.feedEntryContent(Nil, null, null) == "")
  }

  test("F5 quality gates: empty, trailing ellipsis, short text, accept") {
    assert(FeedLogic.feedContentGate("", "http://x.test/a") == Left("no content found"))
    val longText = "Plenty of words here to exceed the minimum feed text gate. " * 12
    assert(FeedLogic.feedContentGate(s"<p>$longText ...</p>", "http://x.test/a") ==
      Left("trailing ellipsis"))
    assert(FeedLogic.feedContentGate(s"<p>$longText [...]  </p>", "http://x.test/a") ==
      Left("trailing ellipsis"))
    val short = "<p>way too short</p>"
    assert(FeedLogic.feedContentGate(short, "http://x.test/a") ==
      Left(s"text too short (13)"))
    val ok = FeedLogic.feedContentGate(s"<p>$longText</p>", "http://x.test/a")
    assert(ok.isRight)
    assert(ok.toOption.get.text.contains("Plenty of words"))
    // script text is stripped BEFORE the length gate
    val scripted = "<script>" + ("x" * 600) + "</script><p>tiny</p>"
    assert(FeedLogic.feedContentGate(scripted, "http://x.test/a") ==
      Left("text too short (4)"))
  }

  test("D1 entry key: base64(sha256(utf8(id or link))), bit-exact") {
    // sha256("abc") = ungJnT1W3C4u1jYHbSkumw... (standard test vector)
    assert(FeedLogic.entryId("abc", "ignored-link") ==
      "ungWv48Bz+pBQUDeXa4iI7ADYaOWF3qctBD/YfIAFa0=")
    // id null → link used
    assert(FeedLogic.entryId(null, "abc") == FeedLogic.entryId("abc", null))
    assert(FeedLogic.entryId("", null) ==
      java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(Array.emptyByteArray)))
  }

  test("D7 interval update: ×0.9 / ×1.1 clamped to [1h, 3d]") {
    assert(FeedLogic.updateInterval(14400.0, hadNewItems = true) == 12960.0)
    assert(FeedLogic.updateInterval(14400.0, hadNewItems = false) ==
      14400.0 * 1.1)
    assert(FeedLogic.updateInterval(3700.0, hadNewItems = true) == 3600.0)
    assert(FeedLogic.updateInterval(250000.0, hadNewItems = false) == 259200.0)
  }

  test("U9 at= param strip") {
    assert(FeedLogic.stripAtParam("http://x.test/feed?at=abc123") == "http://x.test/feed")
    assert(FeedLogic.stripAtParam("http://x.test/feed?at=a&b=2") == "http://x.test/feed&b=2")
    assert(FeedLogic.stripAtParam("http://x.test/feed") == "http://x.test/feed")
  }
}
