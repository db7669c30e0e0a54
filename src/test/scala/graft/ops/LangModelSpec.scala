package graft.ops

import graft.spark.SparkSpec

/** t27 LM scoring: hand-computed cross-entropies on a planted corpus
  * (all three probability branches), cap tie-breaks, the production
  * fit-once/score-elsewhere path, and determinism on real data.
  */
class LangModelSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  // Planted corpus: uni a:3 b:3 c:1 z:1 q:1 r:1 (total 10);
  // bigrams "a b":3, "b a":1, "b c":1, "q r":1.
  private val docs = Seq(
    (1L, "a b a b"), (2L, "a b c"), (3L, "z"), (4L, ""), (5L, "q r"))
    .toDF("doc_id", "text")

  private def scoreMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Double)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("hand-computed cross-entropy, hits and oov on the planted corpus") {
    // Expectations use the SAME float ops in the same order as the
    // expression (ce is emitted unrounded), so equality is exact.
    val got = scoreMap(LangModel.lmScoreOn(docs, LangModel.fit(docs)))
    assert(got(1L) == ((4L, 0L, 3L, -Math.log(1.0 / 3.0) / 3.0))) // 0 + ln(1/3) + 0
    assert(got(2L) == ((3L, 0L, 2L, -Math.log(1.0 / 3.0) / 2.0))) // ln(3/3) + ln(1/3)
    assert(got(3L) == ((1L, 0L, 0L, 0.0)))                        // < 2 tokens
    assert(got(4L) == ((0L, 0L, 0L, 0.0)))                        // empty doc
    assert(got(5L) == ((2L, 0L, 1L, 0.0)))                        // ln(1/1) = 0
  }

  test("backoff and OOV-floor branches (fit once, score a new batch)") {
    val model = LangModel.fit(docs)
    val batch = Seq((8L, "zz a"), (9L, "a zz")).toDF("doc_id", "text")
    val got = scoreMap(LangModel.lmScoreOn(batch, model))
    // (zz, a): no bigram, a in vocab -> ln(0.4 * (3/10))
    assert(got(8L) == ((2L, 1L, 0L, -Math.log(0.4 * (3.0 / 10.0)))))
    // (a, zz): no bigram, zz OOV -> ln(0.4 / 10)
    assert(got(9L) == ((2L, 1L, 0L, -Math.log(0.4 / 10.0))))
  }

  test("binding caps: top-K by (count desc, key asc); capped-out tokens are OOV") {
    val model = LangModel.fit(docs, vocabK = 2, bigramK = 1)
    // vocab = {a, b} (both count 3; ties beyond don't reach the cut),
    // bigram table = {"a b"} only.
    val got = scoreMap(LangModel.lmScoreOn(Seq((2L, "a b c")).toDF("doc_id", "text"), model))
    // (a,b): hit ln(3/3)=0; (b,c): "b c" capped out, c OOV -> ln(0.4/10)
    assert(got(2L) == ((3L, 1L, 1L, -Math.log(0.4 / 10.0) / 2.0)))
  }

  test("deterministic on sf0.001 and every row well-formed") {
    val a = LangModel.lmScore(spark, sf001).collect().map(_.toSeq).toSet
    val b = LangModel.lmScore(spark, sf001).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
    val scored = scoreMap(LangModel.lmScore(spark, sf001))
    scored.foreach { case (id, (n, oov, hits, ce)) =>
      assert(oov >= 0 && oov <= n, s"doc $id oov out of range")
      assert(hits >= 0 && hits <= math.max(0L, n - 1), s"doc $id hits out of range")
      assert(!ce.isNaN && !ce.isInfinite, s"doc $id ce not finite")
      if (n < 2) assert(ce == 0.0)
    }
    assert(scored.values.exists(_._3 > 0), "no bigram hits at sf0.001")
  }

  test("null array elements score deterministically as OOV (SQL surface)") {
    // the t27 tokenizer never emits nulls, but lm_score is registered
    // session-wide and array<string> with nulls is legal SQL — the
    // verdict must not depend on the physical array encoding
    graft.spark.LmExpressions.register(spark, LangModel.fit(docs))
    val r = spark.sql(
      "SELECT lm_score(array('a', CAST(NULL AS STRING), 'b')).oov AS oov, " +
        "lm_score(array('a', CAST(NULL AS STRING), 'b')).hits2 AS hits2").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
  }

  test("persisted model round-trips: fit -> save -> load -> score == fit-score") {
    val dir = java.nio.file.Files.createTempDirectory("lm_model").toString
    val model = LangModel.fit(docs)
    LangModel.save(spark, model, dir)
    val loaded = LangModel.load(spark, dir)
    val batch = Seq((8L, "zz a"), (9L, "a zz"), (10L, "a b c")).toDF("doc_id", "text")
    assert(scoreMap(LangModel.lmScoreOn(batch, loaded))
      == scoreMap(LangModel.lmScoreOn(batch, model)))
    assert(loaded.total == model.total && loaded.backoff == model.backoff)
  }

  test("branch coverage under binding caps on sf0.001 (the verify-scale shape)") {
    // The synthetic corpus has 31 distinct tokens; force caps well below
    // that to prove all three probability branches fire on real data
    // (the defaults bind too, but less aggressively).
    val scored = scoreMap(LangModel.lmScore(spark, sf001, vocabK = 16, bigramK = 64))
    assert(scored.values.exists(_._2 > 0), "no OOV tokens — caps not binding")
    assert(scored.values.exists(_._3 > 0), "no bigram-table hits")
    assert(scored.values.exists(v => v._1 >= 2 && v._3 < v._1 - 1),
      "no backoff/floor evaluations")
  }
}
