package graft.ops

import graft.spark.SparkSpec

/** t34 compression ratio: the expression's lengths against an
  * INDEPENDENT Deflater built in the spec, the discrimination property
  * the signal exists for, the SQL surface incl. nulls, the empty-doc
  * header floor, and determinism on real data.
  */
class CompressSpec extends SparkSpec {

  private val s = spark
  import s.implicits._

  /** Independent reference: a fresh Deflater per call, same level. */
  private def zlen(text: String): Long = {
    val d = new java.util.zip.Deflater(graft.spark.CompressExpressions.Level)
    d.setInput(text.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  private def run(docs: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("t34").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.compressRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
  }

  test("lengths match an independent Deflater; boilerplate vs prose discriminates") {
    val boiler = "click here subscribe now " * 200
    val prose = "The quick brown fox vaulted a 43-digit fence; quartz sphinx judges vow. " +
      (1 to 60).map(i => s"unique$i token$i").mkString(" ")
    val got = run(Seq((1L, boiler), (2L, prose), (3L, "")).toDF("doc_id", "text"))
    for ((id, text) <- Seq(1L -> boiler, 2L -> prose, 3L -> "")) {
      val n = text.getBytes("UTF-8").length.toLong
      assert(got(id)._1 == n, s"doc $id n_bytes")
      assert(got(id)._2 == zlen(text), s"doc $id z_bytes vs independent deflater")
    }
    // the signal: template repetition compresses an order of magnitude harder
    assert(got(1L)._3 < 0.1, s"boilerplate ratio ${got(1L)._3} not tiny")
    assert(got(2L)._3 > 3 * got(1L)._3,
      s"prose (${got(2L)._3}) does not separate from boilerplate (${got(1L)._3})")
    // empty doc: n_bytes 0, z_bytes = the stream-header floor, surfaced honestly
    assert(got(3L)._1 == 0L && got(3L)._2 == zlen("") && got(3L)._3 == zlen("").toDouble)
  }

  test("SQL surface: registered expression, null-safe") {
    graft.spark.CompressExpressions.register(spark)
    val r = spark.sql(
      "SELECT deflate_len('aaaaaaaaaa') AS z, deflate_len(CAST(NULL AS STRING)) AS zn").head()
    assert(r.getLong(0) == zlen("aaaaaaaaaa"))
    assert(r.isNullAt(1))
  }

  test("deterministic on real data with a meaningful spread") {
    val a = TextOps.compressRatio(spark, sf001).collect().map(_.toSeq).toSet
    assert(a == TextOps.compressRatio(spark, sf001).collect().map(_.toSeq).toSet)
    val ratios = a.map(_(3).asInstanceOf[Double])
    assert(ratios.size > 1 && ratios.min > 0.0 && ratios.max <= 2.0)
    assert(ratios.max - ratios.min > 0.05, "ratio spread degenerate — signal vacuous")
  }
}
