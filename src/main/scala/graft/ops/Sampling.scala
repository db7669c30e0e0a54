package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t18 — deterministic STRATIFIED SAMPLING: the data-mixing pass of a
  * training pipeline (rebalance a source/language mixture by keeping a
  * per-stratum fraction of documents). Nothing in the reference needs
  * this; it exists for the 100 TB curation story alongside the dedup
  * family.
  *
  * Mechanism: each doc gets a deterministic uniform bucket in
  * [0, 1e6) — `base31(salt || doc_id) % 1e6` under the active
  * [[HashFamily]] — and survives iff bucket < rate(stratum)·1e6. The
  * salt keeps the sampling hash independent of every other hash use of
  * doc_id. Determinism (not `rand()`) is what makes the sample
  * REPRODUCIBLE and INCREMENTAL: re-running over a grown corpus keeps
  * exactly the docs it kept before, so downstream caches and dedup
  * state stay valid — the property a production mixing pass needs.
  *
  * The demo mixture downsamples the majority language (en → 0.30),
  * trims zh (0.80), and keeps the rest — exercising both named-stratum
  * thresholds and the default branch.
  *
  * Scale shape: a per-row projection + filter over a two-column pruned
  * scan — no shuffle, no state; the sampled relation streams straight
  * into whatever consumes it (PlanSpec pins exchange-freedom and the
  * pruned ReadSchema). Unlike the dedup operators, the KEPT SET is
  * family-dependent (the hash value IS the sample), so the spec pins
  * the md5 family's set bit-exactly against a JVM reference computation
  * and checks the xx64 family statistically.
  */
object Sampling {

  val BucketSpace = 1000000L
  private val Salt = "smpl|"

  /** (stratum → keep-rate numerator over [[BucketSpace]]); strata not
    * listed keep everything. Inlined into BOTH the Spark plan and the
    * DuckDB oracle from this one table.
    */
  val Rates: Seq[(String, Long)] = Seq("en" -> 300000L, "zh" -> 800000L)

  private[ops] def thresholdSql: String =
    Rates.foldRight(BucketSpace.toString) { case ((l, r), acc) =>
      s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }

  def stratifiedSample(spark: SparkSession, sfDir: String,
      fam: HashFamily = HashFamily.Xx64): DataFrame =
    stratifiedSampleOn(
      spark.read.parquet(s"$sfDir/documents.parquet"), fam)

  /** The per-doc sampling bucket as a SQL fragment (Spark dialect, per
    * family); [[bucketSqlDuck]] is the DuckDB md5-mirror twin — both are
    * reused verbatim by the t20 curation funnel.
    */
  private[ops] def bucketSql(fam: HashFamily): String =
    s"(${fam.base31Sql(s"concat('$Salt', CAST(doc_id AS STRING))")} % $BucketSpace)"

  private[ops] def bucketSqlDuck: String =
    s"((('0x' || substr(md5(concat('$Salt', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT & 2147483647) % $BucketSpace)"

  def stratifiedSampleOn(docs: DataFrame,
      fam: HashFamily = HashFamily.Xx64): DataFrame =
    docs
      .selectExpr("doc_id", "lang", s"${bucketSql(fam)} AS bucket")
      .filter(expr(s"bucket < $thresholdSql"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t18_stratified_sample" ->
      ((s, d) => stratifiedSample(s, d, fam = HashFamily.of(s)))
  )

  val oracles: Map[String, String] = Map(
    // md5-family mirror: same salt, same base31 slice, same thresholds.
    "t18_stratified_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, $bucketSqlDuck AS bucket
         |  FROM documents)
         |SELECT doc_id, lang, bucket FROM b
         |WHERE bucket < $thresholdSql""".stripMargin
  )
}
