package graft.ops

import graft.spark.SparkSpec

class PackingSpec extends SparkSpec {

  test("prefix sums equal a driver-side reference; chunk math consistent") {
    val rows = Packing.sequencePack(spark, sf001, seqLen = 1024L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_before"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset")))
      .sortBy(_._1)
    assert(rows.length == 500)
    var cum = 0L
    rows.foreach { case (id, n, before, seq, off) =>
      assert(before == cum, s"doc $id: cum_before $before != reference $cum")
      assert(seq == before / 1024L && off == before % 1024L, s"doc $id chunk math")
      cum += n
    }
    assert(cum > 0)
    // the stream spans many sequences (non-vacuous chunking)
    assert(rows.map(_._4).distinct.length > 10)
  }

  test("two-phase prefix sum is deterministic across runs") {
    def run() = Packing.sequencePack(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("prefix sums survive a downstream narrow coalesce (the Verify write shape)") {
    // regression: TaskContext.getPartitionId() is the TASK id — under
    // coalesce(1) many RDD partitions share one task and the offsets
    // reset at every partition boundary; mapPartitionsWithIndex is
    // immune. Verify writes with coalesce(1), so this is the exact
    // shape the driver executes.
    val rows = Packing.sequencePack(spark, sf001).coalesce(1).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_before"))).sortBy(_._1)
    var cum = 0L
    rows.foreach { case (id, n, before) =>
      assert(before == cum, s"doc $id: cum_before $before != $cum under coalesce")
      cum += n
    }
  }

  test("plan has no Window operator — the scale-killer it exists to avoid") {
    val p = Packing.sequencePack(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"single-partition window in plan:\n${p.take(2000)}")
  }
}
