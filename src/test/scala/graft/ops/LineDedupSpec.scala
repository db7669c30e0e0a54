package graft.ops

import org.apache.spark.sql.functions._
import graft.spark.SparkSpec

/** Line-level (CCNet-style) dedup semantics (t24): the > maxDf threshold
  * boundary, per-doc line ordering after reassembly, all-boilerplate docs
  * surviving as empty, and the planted-line wiring of the driver query.
  */
class LineDedupSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def mk(rows: Seq[(Long, Seq[(Long, String)])]) =
    rows.toDF("doc_id", "raw")
      .select(col("doc_id"),
        expr("transform(raw, r -> struct(r._1 AS pos, r._2 AS line))").as("lines"))

  test("threshold is strict: count == maxDf kept, count == maxDf + 1 stripped") {
    // 'at' appears in exactly 2 docs, 'over' in 3; maxDf = 2
    val docs = mk(Seq(
      1L -> Seq(0L -> "at", 1L -> "over", 2L -> "uniq1"),
      2L -> Seq(0L -> "at", 1L -> "over"),
      3L -> Seq(0L -> "over", 1L -> "uniq3")))
    val got = LineDedup.lineDedupOn(docs, maxDf = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "at\nuniq1")
    assert(got(2L) == "at")
    assert(got(3L) == "uniq3")
  }

  test("occurrence count, not distinct-doc count: a doc repeating its own line crosses the threshold") {
    val docs = mk(Seq(
      1L -> Seq(0L -> "spam", 1L -> "keep", 2L -> "spam", 3L -> "spam")))
    val got = LineDedup.lineDedupOn(docs, maxDf = 2L).head()
    assert(got.getString(1) == "keep" && got.getLong(2) == 4L && got.getLong(3) == 1L)
  }

  test("reassembly restores original position order, not arrival order") {
    val docs = mk(Seq(1L -> Seq(5L -> "e", 1L -> "a", 3L -> "c", 2L -> "b")))
    assert(LineDedup.lineDedupOn(docs, maxDf = 10L).head().getString(1) == "a\nb\nc\ne")
  }

  test("a doc whose every line is boilerplate survives with empty text") {
    val docs = mk(Seq(
      1L -> Seq(0L -> "x"), 2L -> Seq(0L -> "x"), 3L -> Seq(0L -> "x")))
    val got = LineDedup.lineDedupOn(docs, maxDf = 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, "", 1L, 0L), (2L, "", 1L, 0L), (3L, "", 1L, 0L)))
  }

  test("driver query strips exactly header+footer from every sf0.001 doc; promo kept") {
    val rows = LineDedup.lineDedup(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getAs[Long]("n_lines_in") - r.getAs[Long]("n_lines_kept") == 2L
    }, "every doc should lose header+footer and nothing else at sf0.001")
    assert(rows.forall(r => !r.getAs[String]("kept_text").contains(LineDedup.HeaderLine)
      && !r.getAs[String]("kept_text").contains(LineDedup.FooterLine)))
    // at sf0.001 the promo line's count is far below MaxDf — it must survive
    val promoDocs = rows.filter(_.getAs[Long]("doc_id") % 50 == 0)
    assert(promoDocs.nonEmpty
      && promoDocs.forall(_.getAs[String]("kept_text").endsWith(LineDedup.PromoLine)))
  }

  test("line forming: 8-word chunks with planted lines at pos 0 / m+1 / m+2") {
    val docs = Seq((50L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    val lines = LineDedup.withPlantedLines(docs)
      .select(explode(col("lines")).as("pl"))
      .select(col("pl.pos"), col("pl.line"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(lines.toSeq == Seq(
      0L -> LineDedup.HeaderLine,
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      2L -> "w9",
      3L -> LineDedup.PromoLine, // doc_id 50 → planted promo
      4L -> LineDedup.FooterLine))
  }
}
