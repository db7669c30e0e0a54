package graft.spark

/** Pins the driver-recompute extraction oracle (VERDICT r05 task 1):
  * the sequential driver mirror in [[ExtractOracle]] must agree with the
  * distributed x1/x2 queries cell-for-cell — the same equality the
  * driver's DuckDB compare checks through the VALUES oracle, asserted
  * here without DuckDB so a kernel / PagesGen / hash drift fails CI
  * before it fails the round.
  */
class ExtractOracleSpec extends SparkSpec {

  private lazy val expected = ExtractOracle.driverRows(spark, sf001).get

  test("driver recompute matches the distributed x1 extraction query") {
    val got = graft.SparkEntry.extractQuery(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val exp = expected
      .map(e => (e.url, e.pid.toLong, e.note, e.error, e.contentLen, e.contentHash))
      .sortBy(_._1)
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g === e) }
  }

  test("driver recompute matches the distributed x2 lineage query") {
    val got = graft.SparkEntry.lineageQuery(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val exp = expected.groupBy(_.pid).toSeq.sortBy(_._1).map { case (pid, rs) =>
      val fails = rs.count(_.error.nonEmpty).toLong
      (pid.toLong, rs.length.toLong, rs.map(_.htmlBytes).sum,
        rs.length - fails, fails)
    }
    assert(got.toSeq === exp)
  }

  test("xxhash64/length driver mirrors match the Spark expressions") {
    import org.apache.spark.sql.functions._
    val samples = Seq("", "a", "hello world", "soft­hyphen", "日本語テキスト",
      "http://corpus.test/articles/doc42.html")
    val df = spark.createDataFrame(samples.map(Tuple1(_))).toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"), length(col("s")).as("l"))
      .collect()
    df.foreach { r =>
      assert(r.getLong(1) === ExtractOracle.sparkXxhash64(r.getString(0)))
      assert(r.getInt(2).toLong === ExtractOracle.sparkLength(r.getString(0)))
    }
  }

  test("dynamicOracles emits all three VALUES oracles under the row cap") {
    val o = ExtractOracle.dynamicOracles(spark, sf001)
    assert(o.keySet === Set("x1_extract", "x2_extract_lineage", "x3_extract_sql"))
    // one VALUES tuple per document in x1/x3; x2 is the ≤32 pid rollup
    val n = expected.length
    assert("\\('http".r.findAllIn(o("x1_extract")).length === n)
    assert("\\('http".r.findAllIn(o("x3_extract_sql")).length === n)
    assert(o("x2_extract_lineage").contains("AS partition_id"))
  }
}
