package graft.ops

import org.apache.spark.sql.functions._
import graft.spark.SparkSpec

/** t25 embedding-space decontamination report semantics. */
class DecontamReportSpec extends SparkSpec {

  private lazy val rows = Similarity.decontamReport(spark, sf001).collect()

  test("report shape: eval slice only, ≤ k ranked rows per eval, floor respected") {
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("eval_id") % 97 == 0))
    assert(rows.forall(_.getAs[Long]("corpus_id") % 97 != 0))
    assert(rows.forall(_.getAs[Double]("cosine") >= Similarity.DecontamFloor))
    val perEval = rows.groupBy(_.getAs[Long]("eval_id"))
    assert(perEval.values.forall(_.length <= Similarity.DecontamK))
    perEval.values.foreach { rs =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"ranks not dense: $ranks")
      // rank order == cosine order (ties by corpus_id)
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Double]("cosine"), r.getAs[Long]("corpus_id")))
      assert(byRank.sliding(2).forall {
        case Array((c1, i1), (c2, i2)) => c1 > c2 || (c1 == c2 && i1 < i2)
        case _ => true
      })
    }
  }

  test("top-1 per eval agrees with an exact JVM brute-force recompute") {
    val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val evals = vecs.keys.filter(_ % 97 == 0)
    for (e <- evals) {
      val best = vecs.collect { case (id, v) if id % 97 != 0 => (cos(vecs(e), v), id) }
        .toSeq.sortBy { case (c, id) => (-c, id) }.head
      val got = rows.filter(r => r.getAs[Long]("eval_id") == e &&
        r.getAs[Long]("rank") == 1L)
      if (best._1 >= Similarity.DecontamFloor) {
        assert(got.length == 1 && got.head.getAs[Long]("corpus_id") == best._2
          && got.head.getAs[Double]("cosine") == best._1,
          s"eval $e: expected $best, got ${got.toSeq}")
      } else assert(got.isEmpty, s"eval $e: sub-floor best must yield no rows")
    }
  }
}
