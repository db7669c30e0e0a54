package graft.ops

import graft.spark.SparkSpec

/** Stratified sampling semantics. The kept set is hash-FAMILY-dependent
  * (the hash value IS the sample), so the md5 family is pinned bit-exactly
  * against a JVM reference computation and the xx64 production family is
  * checked for determinism and statistical rates.
  */
class SamplingSpec extends SparkSpec {

  private def langs(sfDir: String): Map[Long, String] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def rate(lang: String): Long =
    Sampling.Rates.toMap.getOrElse(lang, Sampling.BucketSpace)

  test("md5 family kept set is bit-exact vs a JVM md5 reference") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      md.reset()
      val d = md.digest(s"smpl|$id".getBytes("UTF-8"))
      // first 8 hex chars = bytes 0..3, as in HashFamily.Md5Mirror.base31
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (v & 0x7FFFFFFFL) % Sampling.BucketSpace
    }
    val expected = langs(sf001).collect {
      case (id, l) if bucket(id) < rate(l) => (id, l, bucket(id))
    }.toSet
    val got = Sampling.stratifiedSample(spark, sf001, HashFamily.Md5Mirror)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected,
      s"diff: ${(got diff expected) ++ (expected diff got)}")
    assert(got.nonEmpty && got.size < langs(sf001).size)
  }

  test("xx64 family: deterministic, exact on rate-1.0 strata, ±0.12 on sampled ones") {
    val all = langs(sf001)
    def kept(): Set[(Long, String)] =
      Sampling.stratifiedSample(spark, sf001, HashFamily.Xx64)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k1 = kept()
    assert(k1 == kept(), "sample not deterministic across runs")
    val byLang = all.groupBy(_._2).view.mapValues(_.size).toMap
    val keptByLang = k1.groupBy(_._2).view.mapValues(_.size).toMap
    for ((l, total) <- byLang) {
      val r = rate(l).toDouble / Sampling.BucketSpace
      val got = keptByLang.getOrElse(l, 0).toDouble / total
      if (r == 1.0) assert(got == 1.0, s"$l: rate-1.0 stratum lost docs")
      else assert(math.abs(got - r) < 0.12,
        s"$l: kept fraction $got far from rate $r (n=$total)")
    }
  }
}
