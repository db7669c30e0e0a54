package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.kernel.Clean
import graft.spark.{Page, PagesGen, SparkSpec}
import graft.streaming.StreamingExtract.{FetchEvent, FeedState}

/** Top-level so Spark can derive a clean Product encoder (local case
  * classes capture the suite's outer pointer and break encoding).
  */
case class NearDupDoc(doc_id: Long, text: String)

/** One line occurrence fed to lineFreqStream (top-level for the encoder). */
case class LineOcc(line: String)

class StreamingSpec extends SparkSpec {

  test("streaming extraction matches the kernel per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val source = MemoryStream[Page]
    val pages = PagesGen.fromDocuments(spark, sf001).limit(30).collect()
    source.addData(pages.toSeq)
    val q = StreamingExtract.extractStream(source.toDF(), buckets = 8)
      .writeStream.format("memory").queryName("ext_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ext_out")
      .select("url", "content", "note").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got.size == 30)
    pages.foreach { p =>
      val k = Clean.clean(p.url, p.html)
      assert(got(p.url) == ((k.content, k.note)), s"mismatch ${p.url}")
    }
  }

  test("adaptive schedule state machine: x0.9/x1.1 with clamping across batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val source = MemoryStream[FetchEvent]
    source.addData(
      FetchEvent("f1", 1000.0, 5),  // 14400*0.9 = 12960
      FetchEvent("f1", 2000.0, 0),  // 12960*1.1 = 14256
      FetchEvent("f2", 1000.0, 0))  // 14400*1.1 = 15840
    val q = StreamingExtract.adaptiveSchedule(source.toDS())
      .writeStream.format("memory").queryName("sched_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("sched_out").as[StreamingExtract.ScheduleRow]
      .collect().sortBy(r => (r.feed_url, r.last_fetch_time))
    assert(rows.map(r => (r.feed_url, r.interval_seconds)).toSeq ==
      Seq(("f1", 14400.0 * 0.9), ("f1", 14400.0 * 0.9 * 1.1), ("f2", 14400.0 * 1.1)))
    assert(rows.last.next_due == 1000.0 + 14400.0 * 1.1)
  }

  test("windowed lineage: watermark + tumbling windows aggregate per (window, pid)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val source = MemoryStream[Page]
    val base = PagesGen.fromDocuments(spark, sf001).limit(12).collect()
    // spread pages across two 1-hour windows
    val hour = 3600L * 1000
    val t0 = 1767225600000L // 2026-01-01T00:00Z
    val staged = base.zipWithIndex.map { case (p, i) =>
      p.copy(warc_ts = new java.sql.Timestamp(t0 + (i % 2) * hour + (i * 60000L)))
    }
    source.addData(staged.toSeq)
    val q = StreamingExtract.windowedLineage(source.toDF(), buckets = 4)
      .writeStream.format("memory").queryName("winlin_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("winlin_out").collect()
    val byWindow = rows.groupBy(_.getAs[java.sql.Timestamp]("window_start"))
    assert(byWindow.size >= 2) // pages landed in ≥2 tumbling windows
    assert(rows.map(_.getAs[Long]("input_count")).sum == staged.length)
    assert(rows.forall(r =>
      r.getAs[Long]("ok_count") + r.getAs[Long]("fail_count") ==
        r.getAs[Long]("input_count")))
    // event-time watermark is present in the analyzed plan
    val lineagePlan = StreamingExtract.windowedLineage(source.toDF(), 4)
      .queryExecution.analyzed.toString
    assert(lineagePlan.contains("EventTimeWatermark"), lineagePlan.take(500))
  }

  test("streaming dedup-by-key: first occurrence passes, repeats drop, state bounded") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val source = MemoryStream[Page]
    val base = PagesGen.fromDocuments(spark, sf001).limit(6).collect()
    val t0 = 1767225600000L
    // each page sent twice (identical url → identical D1 key)
    val staged = (base ++ base).zipWithIndex.map { case (p, i) =>
      p.copy(warc_ts = new java.sql.Timestamp(t0 + i * 60000L))
    }
    source.addData(staged.toSeq)
    val q = StreamingExtract.dedupStream(source.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val urls = spark.table("dedup_out").select("url").as[String].collect()
    assert(urls.length == base.length, s"expected ${base.length} uniques, got ${urls.length}")
    assert(urls.toSet == base.map(_.url).toSet)
    // the watermark (bounded state) is in the plan, and the key is D1's
    val plan = StreamingExtract.dedupStream(source.toDF())
      .queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), plan.take(500))
    assert(plan.toLowerCase.contains("sha2"), plan.take(800))
  }

  test("streaming top-K retention: stream-end state equals batch d3 (VERDICT r03 task 4)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val source = MemoryStream[StreamingExtract.EntryEvent]
    val orders = graft.spark.Relational.table(spark, sf001, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .collect()
      .map(r => StreamingExtract.EntryEvent(
        r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue,
        r.get(2).toString))
    val q = StreamingExtract.topKRetention(source.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    // replay in 3 micro-batches so retention + eviction happen incrementally
    orders.grouped(orders.length / 3 + 1).foreach { chunk =>
      source.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("topk_out").as[StreamingExtract.RetainedRow].collect()
    // bounded state/emissions: never more than k rows per (group, version)
    assert(all.groupBy(r => (r.group_key, r.version)).forall(_._2.length <= 3))
    // eviction happened: some group was touched by >1 micro-batch
    assert(all.exists(_.version > 1L))
    val lastVersion = all.groupBy(_.group_key).map { case (g, rs) => g -> rs.map(_.version).max }
    val finalRows = all
      .filter(r => r.version == lastVersion(r.group_key))
      .map(r => (r.group_key, r.entry_id, r.rn)).toSet
    val batch = graft.spark.Relational.d3TopK(spark, sf001, k = 3)
      .collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue,
        r.getAs[Int]("rn"))).toSet
    assert(finalRows == batch,
      s"stream-end retained set diverges from batch d3: " +
        s"only-stream=${(finalRows -- batch).take(5)} only-batch=${(batch -- finalRows).take(5)}")
  }

  test("streaming near-dup candidates: stream-end pair set equals batch LSH candidates") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => NearDupDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id) // arrival in id order: earlier arrival == smaller id
    val source = MemoryStream[NearDupDoc]
    val q = StreamingExtract.nearDupCandidateStream(source.toDF())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("update").start()
    docs.grouped(docs.length / 3 + 1).foreach { chunk =>
      source.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("neardup_out")
      .as[StreamingExtract.BandCandidate].collect()
      .map(c => (c.dup_of, c.new_id)).toSet
    val batch = graft.ops.Dedup.lshCandidatePairs(
        graft.ops.Dedup.minhashSignatures(
          spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text")))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(streamed == batch,
      s"only-stream=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    assert(streamed.nonEmpty, "vacuous: no candidate pairs in the corpus")
  }

  test("streaming near-dup: bucket state cap degrades recall linearly, never quadratically") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // 6 identical docs land in the same buckets in every band: uncapped
    // they pair quadratically (15 pairs); with maxBucket=2 only the two
    // resident ids can be a dup_of — each later arrival emits exactly 2
    val flood = (0L until 6L).map(i =>
      NearDupDoc(i, "alpha beta gamma delta epsilon zeta"))
    val source = MemoryStream[NearDupDoc]
    val q = StreamingExtract.nearDupCandidateStream(source.toDF(), maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_cap_out")
      .outputMode("update").start()
    source.addData(flood)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_cap_out")
      .as[StreamingExtract.BandCandidate].collect()
      .map(c => (c.dup_of, c.new_id)).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L),
      (0L, 4L), (1L, 4L), (0L, 5L), (1L, 5L)),
      s"capped pair set wrong: $pairs")
  }

  test("streaming line frequency: stream-end frequent set equals the batch t24 set") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val lineRows = {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text")
      graft.ops.LineDedup.withPlantedLines(docs)
        .select(explode(col("lines")).as("pl")).select(col("pl.line").as("line"))
        .as[String].collect()
    }
    val source = MemoryStream[LineOcc]
    val q = StreamingExtract.lineFreqStream(source.toDF())
      .writeStream.format("memory").queryName("linefreq_out")
      .outputMode("update").start()
    lineRows.grouped(lineRows.length / 3 + 1).foreach { chunk =>
      source.addData(chunk.toSeq.map(LineOcc))
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("linefreq_out")
      .as[StreamingExtract.FrequentLine].collect()
    assert(streamed.map(_.line).distinct.length == streamed.length,
      "a line crossed the threshold more than once")
    val batch = lineRows.groupBy(identity).collect {
      case (l, occ) if occ.length > graft.ops.LineDedup.MaxDf => l
    }.toSet
    assert(streamed.map(_.line).toSet == batch,
      s"only-stream=${streamed.map(_.line).toSet -- batch} only-batch=${batch -- streamed.map(_.line).toSet}")
    assert(batch.nonEmpty, "vacuous: no frequent lines planted")
  }

  test("streaming line frequency: one emission at the crossing, never again") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val source = MemoryStream[LineOcc]
    val q = StreamingExtract.lineFreqStream(source.toDF(), maxDf = 2L)
      .writeStream.format("memory").queryName("linefreq_cross_out")
      .outputMode("update").start()
    // batch 1: x=1, y=1 — nothing crosses
    source.addData(Seq(LineOcc("x"), LineOcc("y"))); q.processAllAvailable()
    // batch 2: x=2, y=2 — still nothing (threshold is strict >)
    source.addData(Seq(LineOcc("x"), LineOcc("y"))); q.processAllAvailable()
    // batch 3: x=4 — x crosses once with the post-batch count; y stays at 2
    source.addData(Seq(LineOcc("x"), LineOcc("x"))); q.processAllAvailable()
    // batch 4: x=5 — already frequent, no second emission
    source.addData(Seq(LineOcc("x"))); q.processAllAvailable()
    q.stop()
    val got = spark.table("linefreq_cross_out")
      .as[StreamingExtract.FrequentLine].collect().toSeq
    assert(got == Seq(StreamingExtract.FrequentLine("x", 4L)), s"got: $got")
  }

  test("pure transition clamps to [3600, 259200]") {
    var st = FeedState(0.0, 4000.0)
    st = StreamingExtract.step(Some(st), FetchEvent("f", 1.0, 3))
    assert(st.intervalSeconds == 3600.0) // 4000*0.9=3600 exactly at floor
    st = FeedState(0.0, 250000.0)
    st = StreamingExtract.step(Some(st), FetchEvent("f", 1.0, 0))
    assert(st.intervalSeconds == 259200.0) // 275000 clamped
    assert(StreamingExtract.step(None, FetchEvent("f", 9.0, 1)) ==
      FeedState(9.0, 12960.0))
  }
}
