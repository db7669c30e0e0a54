package graft.ops

import graft.spark.SparkSpec

/** t30 exact-substring coverage: hand-computed spans on a planted corpus
  * (cross-doc share, within-doc repeat, overlapping windows, sub-W doc),
  * plus cross-operator consistency with t1 exact dups on real data.
  */
class SubstringSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // All tokens distinct across cases so no window is shared by accident.
  private val base = "a b c d e f g h i j"          // exactly W = 10 tokens
  private val base2 = "p q r s t u v w x z"
  private val run11 = (1 to 11).map(i => s"k$i").mkString(" ")
  private val docs = Seq(
    (1L, s"$base x1 x2 x3"),        // shares the base window with doc 2
    (2L, s"$base y1 y2 y3"),
    (3L, s"$base2 m $base2"),       // within-doc repeat of base2
    (4L, "s1 s2 s3 s4 s5 s6 s7 s8 s9"), // 9 tokens: no windows at all
    (5L, (1 to 15).map(i => s"u$i").mkString(" ")), // unique: no flagged
    (6L, s"$run11 e1 e2"),          // 11-token run shared with doc 7 →
    (7L, s"f1 $run11"),             //   two OVERLAPPING flagged windows
    (8L, (1 to 12).map(i => s"d$i").mkString(" ")), // exact duplicates →
    (9L, (1 to 12).map(i => s"d$i").mkString(" "))  //   FULL coverage
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Double)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  private def onPlanted(): Map[Long, (Long, Long, Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("t30").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    rows(Substring.substringDup(spark, dir))
  }

  test("hand-computed spans: share, within-doc repeat, overlap, sub-W, unique") {
    val got = onPlanted()
    assert(got(1L) == ((13L, 1L, 10L, 0.7692))) // one shared window, W tokens covered
    assert(got(2L) == ((13L, 1L, 10L, 0.7692)))
    // doc 3: base2 at pos 1 and pos 12 → 10 + min(10, 11) = 20 of 21
    assert(got(3L) == ((21L, 2L, 20L, 0.9524)))
    assert(got(4L) == ((9L, 0L, 0L, 0.0)))
    assert(got(5L) == ((15L, 0L, 0L, 0.0)))
    // doc 6: flagged pos {1, 2} → 10 + min(10, 1) = 11 of 13 (telescoping)
    assert(got(6L) == ((13L, 2L, 11L, 0.8462)))
    // doc 7: the run starts at pos 2 → flagged {2, 3} → 11 of 12
    assert(got(7L) == ((12L, 2L, 11L, 0.9167)))
    // docs 8/9: byte-identical → every window flagged → FULL coverage
    assert(got(8L) == ((12L, 3L, 12L, 1.0)))
    assert(got(9L) == ((12L, 3L, 12L, 1.0)))
  }

  test("real data: flagged population exists and every row is internally consistent") {
    val got = rows(Substring.substringDup(spark, sf001))
    assert(got.size == 500)
    // the synthetic corpus' near-dups must share verbatim W-token runs,
    // or the operator is vacuous at verify scale
    assert(got.values.exists(_._2 > 0), "no flagged windows at sf0.001")
    assert(got.values.exists(_._3 == 0), "every doc flagged — signal is degenerate")
    got.foreach { case (id, (n, w, span, frac)) =>
      assert(span <= n && span >= 0, s"doc $id span out of range")
      assert((w == 0) == (span == 0), s"doc $id windows/span inconsistent")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id frac out of range")
    }
  }

  // ---- t37 strip ----

  private def stripRows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, String)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("t37: hand-computed stripped texts (overlap merge, full coverage, untouched docs)") {
    val dir = java.nio.file.Files.createTempDirectory("t37").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = stripRows(Substring.substringStrip(spark, dir))
    assert(got(1L) == ((13L, 3L, "x1 x2 x3")))
    assert(got(2L) == ((13L, 3L, "y1 y2 y3")))
    assert(got(3L) == ((21L, 1L, "m")))             // both base2 copies stripped
    assert(got(4L) == ((9L, 9L, "s1 s2 s3 s4 s5 s6 s7 s8 s9"))) // sub-W: untouched
    assert(got(5L)._2 == 15L)                       // unique doc untouched
    assert(got(6L) == ((13L, 2L, "e1 e2")))         // overlapping windows merge to [1,12)
    assert(got(7L) == ((12L, 1L, "f1")))
    assert(got(8L) == ((12L, 0L, "")))              // exact pair: fully stripped
    assert(got(9L) == ((12L, 0L, "")))
  }

  test("t37: kept_tokens == n_tokens - t30.dup_span_tokens row-for-row on real data") {
    val t30 = rows(Substring.substringDup(spark, sf001))
    val t37 = stripRows(Substring.substringStrip(spark, sf001))
    assert(t37.size == t30.size)
    t37.foreach { case (id, (n, kept, text)) =>
      val (n30, _, span, _) = t30(id)
      assert(n == n30 && kept == n - span,
        s"doc $id: kept $kept != $n - $span (telescoping identity broken)")
      val textToks = if (text.isEmpty) 0L else text.split(" ").length.toLong
      assert(textToks == kept, s"doc $id: stripped text has $textToks tokens, claimed $kept")
    }
  }

  test("deterministic across runs") {
    val a = rows(Substring.substringDup(spark, sf001))
    assert(a == rows(Substring.substringDup(spark, sf001)))
    assert(a.nonEmpty)
  }
}
