package graft.ops

import graft.spark.SparkSpec

/** t36 corpus stats: hand-computed rollup cells on a planted corpus and
  * cross-level conservation on real data.
  */
class CorpusStatsSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Map[(Option[String], Option[String]), (Int, Int, Long, Long, Long, Double)] =
    df.collect().map { r =>
      (Option(r.getString(0)), Option(r.getString(1))) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    }.toMap

  test("planted corpus: every cube cell and its GROUPING markers") {
    val dir = java.nio.file.Files.createTempDirectory("t36").toString
    Seq(
      (1L, "a b c", "en", "web", 5L),
      (2L, "d e", "en", "web", 3L),
      (3L, "f", "en", "books", 1L),
      (4L, "g h i j", "fr", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rows(TextOps.corpusStats(spark, dir))
    assert(got.size == 3 + 2 + 2 + 1) // pairs + langs + sources + total
    assert(got((Some("en"), Some("web"))) == ((0, 0, 2L, 5L, 8L, 2.5)))
    assert(got((Some("en"), Some("books"))) == ((0, 0, 1L, 1L, 1L, 1.0)))
    assert(got((Some("fr"), Some("web"))) == ((0, 0, 1L, 4L, 7L, 4.0)))
    assert(got((Some("en"), None)) == ((0, 1, 3L, 6L, 9L, 2.0)))
    assert(got((Some("fr"), None)) == ((0, 1, 1L, 4L, 7L, 4.0)))
    assert(got((None, Some("web"))) == ((1, 0, 3L, 9L, 15L, 3.0)))
    assert(got((None, Some("books"))) == ((1, 0, 1L, 1L, 1L, 1.0)))
    assert(got((None, None)) == ((1, 1, 4L, 10L, 16L, 2.5)))
  }

  test("real data: every rollup level conserves docs and tokens") {
    val got = rows(TextOps.corpusStats(spark, sf001))
    val total = got((None, None))
    assert(total._3 == 500L)
    def level(gl: Int, gs: Int) = got.values.filter(v => v._1 == gl && v._2 == gs)
    for ((gl, gs) <- Seq((0, 0), (0, 1), (1, 0))) {
      assert(level(gl, gs).map(_._3).sum == total._3, s"docs not conserved at ($gl,$gs)")
      assert(level(gl, gs).map(_._4).sum == total._4, s"tokens not conserved at ($gl,$gs)")
    }
    got.foreach { case (k, v) =>
      assert(v._6 == v._4.toDouble / v._3, s"avg_tokens drift at $k")
    }
  }
}
