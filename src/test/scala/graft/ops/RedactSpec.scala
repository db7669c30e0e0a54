package graft.ops

import graft.spark.SparkSpec

/** PII redaction semantics (t23) on crafted rows — pattern boundaries,
  * pass ordering, and the planted-contact-line wiring. The DuckDB oracle
  * pins the dialect parity; these cases pin the intended behavior so a
  * pattern edit that still happens to agree across dialects can't silently
  * change what gets scrubbed.
  */
class RedactSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def redactOne(text: String): (String, Long, Long, Long) = {
    val r = Redact.redactPii(Seq((1L, text)).toDF("doc_id", "text"))
      .select("redacted", "n_email", "n_ip", "n_phone").head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("email, IPv4 and phone each redact with counts") {
    val (s, e, i, p) =
      redactOne("mail a.b+c@sub.example.co.uk from 192.168.0.1 or +4915112345678 now")
    assert(s == "mail <EMAIL> from <IP> or <PHONE> now")
    assert((e, i, p) == (1L, 1L, 1L))
  }

  test("phone boundaries: 7 digits too short, 16 digits too long, 8 and 15 match") {
    assert(redactOne("+1234567")._1 == "+1234567")            // 7 — kept
    assert(redactOne("+12345678")._1 == "<PHONE>")            // 8 — redacted
    assert(redactOne("+123456789012345")._1 == "<PHONE>")     // 15 — redacted
    // 16 digits: \b after {8,15} fails at every split point — untouched
    assert(redactOne("+1234567890123456")._1 == "+1234567890123456")
  }

  test("IPv4 needs word boundaries on both sides") {
    assert(redactOne("at 10.0.0.1, ok")._1 == "at <IP>, ok")
    assert(redactOne("v1.2.3.4beta")._1 == "v1.2.3.4beta")    // trailing word char
    assert(redactOne("a1.2.3.4")._1 == "a1.2.3.4")            // leading word char
  }

  test("pass ordering: digits inside a redacted email never count as phone/IP") {
    // the email consumes its digit run before the phone pass sees it
    val (s, e, i, p) = redactOne("ping +12345678901@example.com")
    assert(s == "ping +<EMAIL>" || s == "ping <EMAIL>", s)
    assert(e == 1L && i == 0L && p == 0L)
  }

  test("multiple occurrences all redact and count") {
    val (s, e, i, p) = redactOne("a@b.co c@d.org 1.2.3.4 5.6.7.8 +12345678 +87654321")
    assert(s == "<EMAIL> <EMAIL> <IP> <IP> <PHONE> <PHONE>")
    assert((e, i, p) == (2L, 2L, 2L))
  }

  test("driver query plants contact lines on every 7th doc and redacts them") {
    val rows = Redact.queries("t23_pii_redact")(spark, sf001).collect()
    val planted = rows.filter(_.getAs[Long]("doc_id") % 7 == 0)
    assert(planted.nonEmpty)
    assert(planted.forall(r => r.getAs[Long]("n_email") == 1L
      && r.getAs[Long]("n_ip") == 1L
      && r.getAs[String]("redacted").contains("<EMAIL>")
      && r.getAs[String]("redacted").contains("<IP>")))
    // doc_id 0 plants the 7-digit +155500 — the one planted phone that is
    // deliberately BELOW the E.164 floor and must survive unredacted
    val d0 = planted.find(_.getAs[Long]("doc_id") == 0L).get
    assert(d0.getAs[Long]("n_phone") == 0L
      && d0.getAs[String]("redacted").contains("+155500"))
    assert(rows.filter(_.getAs[Long]("doc_id") % 7 != 0)
      .forall(r => r.getAs[Long]("n_email") == 0L))
  }
}
