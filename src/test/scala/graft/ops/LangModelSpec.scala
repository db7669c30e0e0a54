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

  // ---- t31 perplexity bucketing ----

  /** Independent driver-side recompute of the t31 contract: quantize,
    * then per lang the pure-integer discrete-quantile thresholds.
    */
  private def bucketsByHand(ces: Map[Long, (String, Double)]): Map[Long, String] = {
    val byLang = ces.groupBy(_._2._1)
    byLang.flatMap { case (_, docs) =>
      val qs = docs.view.mapValues { case (_, ce) =>
        math.floor(ce * LangModel.QuantSteps).toLong
      }.toMap
      val n = qs.size
      val sorted = qs.values.toSeq.sorted
      def thr(mult: Int): Long =
        sorted.find(q => sorted.count(_ <= q) * 3 >= mult * n).get
      val (t1, t2) = (thr(1), thr(2))
      qs.map { case (id, q) =>
        id -> (if (q <= t1) "head" else if (q <= t2) "middle" else "tail")
      }
    }
  }

  private def bucketRows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, Double, String)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap

  test("t31: buckets match an independent driver-side recompute (two langs, ties, ce=0)") {
    // Nine en docs with a ce spread (increasing OOV density), an exact
    // tie pair (identical text), a < 2-token doc (ce = 0 -> head), and a
    // second language whose thresholds must be independent.
    val planted = (
      (1 to 9).map(i => (i.toLong, ("a b " * (10 - i)) + (1 to i).map(k => s"oov$k").mkString(" "), "en")) ++
        Seq((10L, "a b a b c", "en"), (11L, "a b a b c", "en"), (12L, "solo", "en"),
          (13L, "a b a b", "xx"), (14L, "a b c z", "xx"), (15L, "q r oovx oovy", "xx"))
      ).toDF("doc_id", "text", "lang")
    val model = LangModel.fit(planted)
    val got = bucketRows(LangModel.pplBucketsOn(planted, model))
    assert(got.size == 15)
    val ces = got.map { case (id, (lang, ce, _)) => id -> ((lang, ce)) }
    val expect = bucketsByHand(ces)
    got.foreach { case (id, (_, _, b)) =>
      assert(b == expect(id), s"doc $id: got $b, expected ${expect(id)}")
    }
    // the tie pair shares a bucket; the sub-2-token doc heads its lang
    assert(got(10L)._3 == got(11L)._3)
    assert(got(12L)._2 == 0.0 && got(12L)._3 == "head")
    // both langs produced all three buckets
    Seq("en", "xx").foreach { l =>
      val bs = got.values.filter(_._1 == l).map(_._3).toSet
      assert(bs == Set("head", "middle", "tail"), s"$l buckets: $bs")
    }
  }

  test("t31: real data — per-lang tercile invariants, t27 consistency, determinism") {
    val got = bucketRows(LangModel.pplBuckets(spark, sf001))
    assert(got.size == 500)
    // ce values are byte-identical to t27's (same expression, same fit)
    val t27ce = LangModel.lmScore(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    got.foreach { case (id, (_, ce, _)) => assert(ce == t27ce(id), s"doc $id ce drift") }
    // discrete-quantile invariants per lang, on the quantized key:
    // #(q <= t1)*3 >= n with t1 minimal, same at 2n; ordering strict
    got.groupBy(_._2._1).foreach { case (lang, docs) =>
      // .toSeq BEFORE .map: mapping the Map with a pair-producing fn
      // would rebuild a Map keyed by q and silently collapse ties
      val qs = docs.toSeq.map { case (_, (_, ce, b)) =>
        (math.floor(ce * LangModel.QuantSteps).toLong, b) }
      val n = qs.size
      val h = qs.count(_._2 == "head"); val m = qs.count(_._2 == "middle")
      assert(h > 0 && m > 0 && h + m < n, s"$lang missing a bucket (h=$h m=$m n=$n)")
      val t1 = qs.filter(_._2 == "head").map(_._1).max
      assert(h * 3 >= n, s"$lang head too small")
      assert((h - qs.count(q => q._1 == t1)) * 3 < n, s"$lang t1 not minimal")
      val t2 = qs.filter(_._2 == "middle").map(_._1).max
      assert((h + m) * 3 >= 2 * n, s"$lang head+middle too small")
      assert((h + m - qs.count(q => q._1 == t2)) * 3 < 2 * n, s"$lang t2 not minimal")
      assert(t1 < qs.filter(_._2 == "middle").map(_._1).min, s"$lang head/middle overlap")
      assert(t2 < qs.filter(_._2 == "tail").map(_._1).min, s"$lang middle/tail overlap")
    }
    assert(bucketRows(LangModel.pplBuckets(spark, sf001)) == got)
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
