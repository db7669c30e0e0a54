package graft.ops

import graft.spark.SparkSpec

/** t3 quality scoring: the avg_word_len strip class must equal the
  * tokenizer's split class — a literal-space replace counts tabs and
  * newlines as word characters on multi-line documents (review finding,
  * r06; latent on the single-line synthetic corpus).
  */
class QualitySpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  test("avg_word_len strips the full tokenizer whitespace class") {
    val dir = java.nio.file.Files.createTempDirectory("t3ws").toString
    Seq(
      (1L, "foo\tbar"),          // tab-separated: 2 words, 6 chars -> 3.0
      (2L, "foo bar"),           // space-separated control -> 3.0
      (3L, "a\nbb\r\ncc dd\t"),  // mixed separators: 4 words, 7 chars
      (4L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 3.0)), s"tab doc: ${got(1L)}")
    assert(got(2L) == ((2L, 3.0)))
    assert(got(3L) == ((4L, 1.75)), s"mixed doc: ${got(3L)}")
    assert(got(4L) == ((0L, 0.0)))
  }
}
