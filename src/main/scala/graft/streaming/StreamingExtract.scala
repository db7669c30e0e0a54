package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.spark.{ExtractJob, ExtractedRow}

/** Structured Streaming surfaces (SURVEY.md §2.10/§3.3):
  *
  *  - `extractStream`: the extraction kernel over a streaming `pages`
  *    source (readStream → kernel → writeStream). Per-row, narrow, no
  *    state — the batch job's pid column is kept so downstream lineage
  *    aggregation works per micro-batch via foreachBatch + ExtractJob
  *    .lineage.
  *
  *  - `adaptiveSchedule`: the reference's feed-polling state machine
  *    (feed.py:45-46,171-179 ×0.9/×1.1 clamp [3600,259200] + last_fetch
  *    bookkeeping, D7) as a `flatMapGroupsWithState` over a stream of
  *    fetch outcomes — the canonical Spark shape for per-key adaptive
  *    intervals.
  */
object StreamingExtract {

  /** Streaming variant of ExtractJob.extract: same kernel, same row type.
    * Input must be a streaming DataFrame with (url STRING, html BINARY).
    */
  def extractStream(
      pages: DataFrame,
      buckets: Int,
      maxHtmlBytes: Int = ExtractJob.DefaultMaxHtmlBytes): Dataset[ExtractedRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withColumn("pid", pmod(xxhash64(col("url")), lit(buckets)).cast("int"))
      .select("url", "html", "pid")
      .as[(String, Array[Byte], Int)]
      .mapPartitions(_.map { case (url, html, pid) =>
        ExtractJob.extractOne(url, html, pid, maxHtmlBytes, attempts = 2)
      })
  }

  /** Event-time windowed lineage over a streaming pages source: watermark
    * on `warc_ts` (bounds state; late pages beyond it are dropped) +
    * tumbling-window aggregation per (window, pid) — the canonical
    * Structured Streaming shape for continuous per-partition lineage.
    * State per key is a handful of counters, so a 10^12-doc stream holds
    * only (windows-in-watermark × buckets) aggregation rows.
    */
  def windowedLineage(
      pages: DataFrame,
      buckets: Int,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "2 hours",
      maxHtmlBytes: Int = ExtractJob.DefaultMaxHtmlBytes): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withColumn("pid", pmod(xxhash64(col("url")), lit(buckets)).cast("int"))
      .select("warc_ts", "url", "html", "pid")
      .as[(java.sql.Timestamp, String, Array[Byte], Int)]
      .map { case (ts, url, html, pid) =>
        (ts, ExtractJob.extractOne(url, html, pid, maxHtmlBytes, attempts = 2))
      }
      .toDF("warc_ts", "r")
      .withWatermark("warc_ts", watermarkDelay)
      .groupBy(window(col("warc_ts"), windowDuration), col("r.pid").as("pid"))
      .agg(
        count(lit(1)).as("input_count"),
        sum(col("r.in_bytes")).as("input_bytes"),
        count(when(col("r.error").isNull, 1)).as("ok_count"),
        count(when(col("r.error").isNotNull, 1)).as("fail_count"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("pid"), col("input_count"), col("input_bytes"),
        col("ok_count"), col("fail_count"))
  }

  /** Streaming dedup-by-key — the D2 analogue on an unbounded stream
    * (SURVEY.md §2.10): first occurrence of each entry key within the
    * watermark horizon passes, repeats drop.  `dropDuplicatesWithinWatermark`
    * bounds state to keys seen inside the delay window (plain
    * dropDuplicates on a stream grows state forever — the 10^12-row
    * anti-pattern).  Key derivation is the SAME D1 expression the batch
    * path uses (base64(unhex(sha2))) so batch and stream agree on
    * identity.
    */
  def dedupStream(
      pages: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    pages
      .withColumn("entry_key", graft.spark.Relational.entryKeyCol(col("url")))
      .withWatermark("warc_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("entry_key")
  }

  /** One entry arriving on the stream for top-K retention: `sort_key`
    * is the recency key (ISO date string — lexicographic = chronological),
    * matching batch D3's ORDER BY o_orderdate DESC, o_orderkey DESC.
    */
  final case class EntryEvent(group_key: Long, entry_id: Long, sort_key: String)

  /** One retained entry after a micro-batch touched its group. `version`
    * increments per group per invocation, so "the group's final state" =
    * its max-version rows — the contract a changelog sink compacts on.
    */
  final case class RetainedRow(group_key: Long, entry_id: Long, rn: Int, version: Long)

  final case class TopKState(version: Long, entries: List[(String, Long)])

  /** Streaming stateful top-K retention with eviction (VERDICT r03 task
    * 4) — the §2.10 analogue of batch D3/D4 (models.py:25,39-48: keep the
    * newest 50 entries per feed, delete the rest). State per group is the
    * current top-k list and NOTHING else: merging new events then
    * trimming to k is a correct streaming summary because top-k is
    * monotone — the true top-k of the whole stream equals the top-k of
    * (top-k of any prefix) ∪ suffix, so an evicted entry can never
    * re-enter. At 10^12 rows the state store holds ≤ k·groups entries,
    * the same bound the reference's per-feed delete loop maintains.
    *
    * Emits the group's full retained set (Update semantics) each time a
    * micro-batch touches the group; rows beyond k silently leave the
    * state — the D4 delete set is the version-over-version difference.
    */
  def topKRetention(entries: Dataset[EntryEvent], k: Int = 50): Dataset[RetainedRow] = {
    val spark = entries.sparkSession
    import spark.implicits._
    val ord: Ordering[(String, Long)] =
      Ordering.Tuple2(Ordering.String.reverse, Ordering.Long.reverse)
    entries
      .groupByKey(_.group_key)
      .flatMapGroupsWithState[TopKState, RetainedRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, evs: Iterator[EntryEvent], state: GroupState[TopKState]) =>
          val prev = state.getOption.getOrElse(TopKState(0L, Nil))
          val merged = (prev.entries ++ evs.map(e => (e.sort_key, e.entry_id)))
            .distinct.sorted(ord).take(k)
          val next = TopKState(prev.version + 1, merged)
          state.update(next)
          merged.iterator.zipWithIndex.map { case ((_, id), i) =>
            RetainedRow(key, id, i + 1, next.version)
          }
      }
  }

  /** One LSH band-bucket candidate emitted by [[nearDupCandidateStream]]:
    * the arriving doc paired against a doc already resident in the same
    * (band_idx, band_hash) bucket. `dup_of` arrived strictly earlier (or
    * earlier-in-batch by doc_id), so with arrival in doc_id order the
    * DISTINCT (dup_of, new_id) set equals the batch
    * [[graft.ops.Dedup.lshCandidatePairs]] (id_a, id_b) set —
    * StreamingSpec pins the equivalence.
    */
  final case class BandCandidate(new_id: Long, dup_of: Long, band_idx: Int)

  /** Per-bucket state: doc ids resident in this band bucket, oldest
    * first, capped at `maxBucket`.
    */
  final case class BucketState(ids: List[Long])

  /** Streaming MinHash-LSH candidate generation — the §2.10 analogue of
    * the batch t6/t17 candidate stage: signatures per-row (the codegen'd
    * `minhash_sig` expression evaluates fine on a streaming relation),
    * bands exploded per-row, then ONE stateful shuffle keyed by the band
    * bucket. State per bucket is the resident doc-id list and nothing
    * else (signatures stay OUT of the state store — est_jaccard
    * verification joins the persisted signature table downstream, e.g.
    * in foreachBatch, exactly like the batch pipeline's verify stage).
    *
    * A flood bucket would grow state unboundedly, so residency is capped
    * at `maxBucket` (the state-store analogue of t8's hot-shingle df
    * cap): overflow docs still PAIR against the resident ids — candidate
    * recall degrades gracefully from quadratic to linear in the flood —
    * but are not stored. At 10^12 docs the state store holds ≤
    * maxBucket · buckets ids, and each arriving doc costs at most
    * bands · maxBucket emitted pairs.
    */
  def nearDupCandidateStream(
      docs: DataFrame,
      fam: graft.ops.HashFamily = graft.ops.HashFamily.Xx64,
      maxBucket: Int = 1000): Dataset[BandCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.Dedup.lshBands(graft.ops.Dedup.minhashSignatures(docs, fam), fam)
      // the bucket key stringifies band_hash so both families (long under
      // xx64, string under the md5 mirror) share one state schema
      .selectExpr(
        "concat(cast(band_idx AS string), '|', cast(band_hash AS string)) AS bucket",
        "doc_id", "band_idx")
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, BandCandidate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, evs: Iterator[(String, Long, Int)],
            state: GroupState[BucketState]) =>
          val prior = state.getOption.map(_.ids).getOrElse(Nil)
          val seen = scala.collection.mutable.LinkedHashSet(prior: _*)
          val out = List.newBuilder[BandCandidate]
          // earlier-in-batch by doc_id ≡ earlier arrival for a source
          // that feeds docs in id order (the equivalence the spec pins)
          for ((_, id, bidx) <- evs.toVector.distinct.sortBy(_._2)
               if !seen.contains(id)) {
            for (p <- seen) out += BandCandidate(id, p, bidx)
            if (seen.size < maxBucket) seen += id
          }
          state.update(BucketState(seen.toList))
          out.result().iterator
      }
  }

  /** A line that crossed the boilerplate threshold on the stream: emitted
    * by [[lineFreqStream]] exactly ONCE, in the micro-batch that takes its
    * cumulative count from ≤ maxDf to > maxDf (`n` = the cumulative count
    * after that batch). The stream-end emitted line set therefore equals the
    * batch `groupBy(line).count() > maxDf` frequent set regardless of
    * how occurrences fall into micro-batches — StreamingSpec pins it.
    */
  final case class FrequentLine(line: String, n: Long)

  /** Per-line state: cumulative occurrence count (public — Spark's state
    * encoder codegen requires accessible constructors, as with
    * [[BucketState]]).
    */
  final case class LineCount(n: Long)

  /** Streaming maintenance of the t24 line-frequency relation — the
    * incremental-ingest analogue of [[graft.ops.LineDedup]]'s frequency
    * stage (ICEBERG.md §5b: production appends per-batch partial counts
    * to a persisted `line_freq` table; this is the same dataflow kept
    * inside the state store). Input: a streaming relation with one row
    * per line OCCURRENCE (column `line`); output: threshold crossings
    * only, so downstream strip jobs receive precisely the boilerplate
    * set deltas and the sink stays tiny no matter how hot a banner runs.
    *
    * State is one counter per distinct line seen — bounded per key
    * (flood lines don't grow it) but keyed by line text here for
    * byte-exact parity with the batch oracle; at corpus scale the key is
    * the 128-bit line fingerprint and the store is RocksDB, or the
    * foreachBatch append-and-compact variant replaces in-store counting
    * outright (same trade documented on the batch op).
    */
  def lineFreqStream(lines: DataFrame, maxDf: Long = graft.ops.LineDedup.MaxDf): Dataset[FrequentLine] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("line").cast("string")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[LineCount, FrequentLine](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (line: String, evs: Iterator[String], state: GroupState[LineCount]) =>
          val prior = state.getOption.map(_.n).getOrElse(0L)
          val next = prior + evs.size
          state.update(LineCount(next))
          if (prior <= maxDf && next > maxDf)
            Iterator.single(FrequentLine(line, next))
          else Iterator.empty
      }
  }

  /** One fetch outcome observed on the stream. */
  final case class FetchEvent(feed_url: String, fetch_time: Double, new_items: Int)

  /** Per-feed polling state (models.py:35-36). */
  final case class FeedState(lastFetchTime: Double, intervalSeconds: Double)

  /** Updated schedule row emitted per event. */
  final case class ScheduleRow(
      feed_url: String,
      last_fetch_time: Double,
      interval_seconds: Double,
      next_due: Double)

  val MinInterval = 3600.0
  val MaxInterval = 259200.0
  val DefaultInterval = 14400.0

  /** Pure transition (unit-testable; mirrors graft.kernel.FeedLogic
    * updateInterval semantics).
    */
  def step(prev: Option[FeedState], ev: FetchEvent): FeedState = {
    val cur = prev.map(_.intervalSeconds).getOrElse(DefaultInterval)
    val scaled = if (ev.new_items > 0) cur * 0.9 else cur * 1.1
    val clamped = math.min(math.max(scaled, MinInterval), MaxInterval)
    FeedState(ev.fetch_time, clamped)
  }

  def adaptiveSchedule(events: Dataset[FetchEvent]): Dataset[ScheduleRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.feed_url)
      .flatMapGroupsWithState[FeedState, ScheduleRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (feedUrl: String, evs: Iterator[FetchEvent], state: GroupState[FeedState]) =>
          var cur = state.getOption
          val out = evs.toSeq.sortBy(_.fetch_time).map { ev =>
            val next = step(cur, ev)
            cur = Some(next)
            ScheduleRow(feedUrl, next.lastFetchTime, next.intervalSeconds,
              next.lastFetchTime + next.intervalSeconds)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
