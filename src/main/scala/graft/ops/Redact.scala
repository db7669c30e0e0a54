package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t23 — PII REDACTION: the scrubbing pass every production training-data
  * pipeline runs before export (emails, IPv4 addresses, E.164-style phone
  * numbers → typed placeholder tokens, plus per-doc match counts for the
  * curation ledger). Nothing in the reference needs this; it completes the
  * curation story alongside dedup (t1/t6/t13), quality gates (t3/t4) and
  * export (t21).
  *
  * Pattern dialect: the three regexes are written in the common subset of
  * Java regex (Spark's engine) and RE2 (DuckDB's) — character classes,
  * bounded repetition and `\b` only; no backreferences or lookaround — so
  * the SAME pattern string is inlined into both the Spark plan and the
  * DuckDB oracle. Passes apply in a fixed order (email → IPv4 → phone),
  * each counting on the PREVIOUS pass's output, so the count/replace
  * composition is deterministic and dialect-independent.
  *
  * Scale shape: a per-row projection over a pruned two-column scan — no
  * shuffle, no state, streams straight into the export writer. Regex
  * matching is the only cost and it is codegen'd (`RegExpReplace` /
  * `RegExpExtractAll` are Catalyst expressions, not UDFs); at 100 TB this
  * runs at scan speed and the plan is exchange-free (PlanSpec pins it).
  *
  * The synthetic corpus carries no PII, so the driver query plants a
  * deterministic contact line on every 7th doc (mirrored verbatim in the
  * oracle SQL) — the redactor itself never special-cases planted rows.
  */
object Redact {

  /** Local-part@domain.tld — the pragmatic scrubbing pattern (not RFC
    * 5322; production scrubbers deliberately over-match).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like `1.2.3.4.5`
    * still match their first four octets but `a1.2.3.4` does not.
    */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** `+` followed by 8-15 digits (E.164 envelope), word-bounded on the
    * right so 16+-digit runs are NOT partially redacted.
    */
  val PhonePattern = "\\+\\d{8,15}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  private def countMatches(c: Column, pat: String): Column =
    size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")

  /** text → (redacted, n_email, n_ip, n_phone). Email → IPv4 → phone, each
    * pass counting on its input BEFORE replacing, so e.g. digits inside an
    * already-redacted email can never double-count as a phone number.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, lit(EmailPattern), lit(EmailToken))
    val t2 = regexp_replace(t1, lit(Ipv4Pattern), lit(IpToken))
    val t3 = regexp_replace(t2, lit(PhonePattern), lit(PhoneToken))
    docs
      .withColumn("n_email", countMatches(t0, EmailPattern))
      .withColumn("n_ip", countMatches(t1, Ipv4Pattern))
      .withColumn("n_phone", countMatches(t2, PhonePattern))
      .withColumn("redacted", t3)
  }

  /** Deterministic planted contact line for every 7th doc — the corpus
    * itself is PII-free, so without this the oracle would only pin the
    * no-op path. Mirrored verbatim by [[plantSqlDuck]].
    */
  private[ops] def planted: Column =
    when(col("doc_id") % 7 === 0,
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1555"), col("doc_id").cast("string"),
        lit("0 at 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") % 100).cast("string")))
      .otherwise(col("text"))

  private[ops] def plantSqlDuck: String =
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)" +
      " || '@example.com or +1555' || CAST(doc_id AS VARCHAR) || '0 at 10.0.'" +
      " || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)" +
      " ELSE text END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t23_pii_redact" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), planted.as("text"))
      redactPii(docs)
        .select(col("doc_id"), col("redacted"), col("n_email"), col("n_ip"), col("n_phone"))
    })
  )

  val oracles: Map[String, String] = Map(
    "t23_pii_redact" ->
      s"""WITH src AS (SELECT doc_id, $plantSqlDuck AS text FROM documents),
         |s1 AS (SELECT doc_id, text AS t0,
         |         regexp_replace(text, '$EmailPattern', '$EmailToken', 'g') AS t1
         |       FROM src),
         |s2 AS (SELECT *, regexp_replace(t1, '$Ipv4Pattern', '$IpToken', 'g') AS t2 FROM s1)
         |SELECT doc_id,
         |       regexp_replace(t2, '$PhonePattern', '$PhoneToken', 'g') AS redacted,
         |       CAST(len(regexp_extract_all(t0, '$EmailPattern')) AS BIGINT) AS n_email,
         |       CAST(len(regexp_extract_all(t1, '$Ipv4Pattern')) AS BIGINT) AS n_ip,
         |       CAST(len(regexp_extract_all(t2, '$PhonePattern')) AS BIGINT) AS n_phone
         |FROM s2""".stripMargin
  )
}
