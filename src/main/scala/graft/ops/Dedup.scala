package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline, over
  * `documents` (exact / MinHash+LSH / SimHash / n-gram Jaccard) and
  * `embeddings` (cosine near-dup).
  *
  * Scale design (100 TB posture):
  *  - exact: one hash-groupBy shuffle on a 32-byte key; map-side partial agg.
  *  - minhash: signatures are computed with ONE shuffle (groupBy doc_id of
  *    exploded distinct shingles, 64 min() partial aggs); candidate
  *    generation is a self-equi-join on (band_idx, band_hash) — only
  *    bucket-mates ever meet, never all-pairs. Identical-document floods
  *    (the classic LSH skew) are bounded because exact dedup runs first in
  *    a real pipeline; AQE skew-join handles the rest.
  *  - simhash: per-row 64-bit signature (no shuffle), then the 4×16-bit
  *    pigeonhole band join for hamming ≤ 3 — again equi-join, no all-pairs.
  *  - n-gram Jaccard: exact verification join on shared shingles; meant to
  *    run AFTER an LSH candidate filter at scale (here also standalone as
  *    its own oracle-checked operator).
  *  - embedding cosine: brute-force all-pairs is the small-scale baseline;
  *    the scale path is Similarity.annLsh (hyperplane buckets).
  */
object Dedup {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4 // 16 bands × 4 rows = 64 hashes; th ≈ (1/16)^(1/4) ≈ 0.5

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Exact dedup: hash-groupBy on sha256(text); keeper = min doc_id. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))

  /** Distinct (doc_id, shingle) pairs; shingle = 3-token window (pure
    * higher-order functions — no UDF). Tokens are materialized as a column
    * FIRST so the per-shingle lambda reads an array instead of re-running
    * split+filter per element (that nesting is O(tokens²) per document —
    * measured 4× slower even at sf0.01).
    */
  def shingles(df: DataFrame): DataFrame =
    df.selectExpr("doc_id", "filter(split(text, '\\\\s+'), x -> x != '') AS toks")
      .selectExpr("doc_id",
        """explode(array_distinct(CASE WHEN size(toks) >= 3
          |  THEN transform(sequence(0, size(toks) - 3),
          |       i -> concat_ws(' ', slice(toks, i + 1, 3)))
          |  ELSE array(concat_ws(' ', toks)) END)) AS shingle"""
          .stripMargin.replace("\n", " "))

  /** 64-hash MinHash signature per document. The shingle string is hashed
    * ONCE to a 64-bit base (the expensive part), and the hash family is
    * derived by re-hashing the base long with the function index:
    * h_i(s) = xxhash64(i, xxhash64(s)) — 64 long-hashes instead of 64
    * string-hashes per shingle.
    */
  def minhashSignatures(df: DataFrame): DataFrame =
    minhashSignaturesOnShingles(shingles(df))

  /** Signature aggregation over a prebuilt (doc_id, shingle) relation —
    * lets a pipeline share ONE shingle pass between the signature stage
    * and the Jaccard verify stage (r03: the double shingle pass dominated
    * t13's runtime).
    */
  def minhashSignaturesOnShingles(sh: DataFrame): DataFrame = {
    val aggs: Seq[Column] = (0 until NumHashes).map { i =>
      min(xxhash64(lit(i), col("hs"))).as(s"h$i")
    }
    sh.withColumn("hs", xxhash64(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + LSH banding: near-dup pairs with estimated Jaccard ≥ th. */
  def minhashLsh(spark: SparkSession, sfDir: String, th: Double = 0.5): DataFrame =
    minhashLshOn(docs(spark, sfDir), th)

  def minhashLshOn(docsDf: DataFrame, th: Double): DataFrame =
    minhashLshOnShingles(shingles(docsDf), th)

  def minhashLshOnShingles(sh: DataFrame, th: Double): DataFrame = {
    val sig = minhashSignaturesOnShingles(sh)
    val banded = sig.selectExpr(
      "doc_id", "sig",
      s"""posexplode(transform(sequence(0, ${Bands - 1}),
         | b -> aggregate(slice(sig, b * $RowsPerBand + 1, $RowsPerBand),
         |                CAST(17 AS BIGINT), (a, x) -> xxhash64(a, x))))"""
        .stripMargin.replace("\n", " "))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .selectExpr("id_a", "id_b",
        s"round(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / $NumHashes.0D, 4) AS est_jaccard")
      .filter(col("est_jaccard") >= th)
  }

  /** SimHash 64-bit signature — genuinely imperative bit loop, so it runs
    * as a typed map (the one place mapPartitions-style code is warranted,
    * per-row, narrow, no shuffle).
    */
  def simhash64(tokens: Iterator[String]): Long = {
    val acc = new Array[Int](64)
    while (tokens.hasNext) {
      val t = tokens.next()
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def simhashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, simhash64(text.split("\\s+").iterator.filter(_.nonEmpty)))
      }
      .toDF("doc_id", "simhash")
  }

  /** SimHash near-dup: pigeonhole band join (4 × 16-bit chunks ⇒ any pair
    * within hamming ≤ 3 shares ≥ 1 chunk), then exact hamming filter.
    */
  def simhashDedup(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(spark, sfDir)
    val chunked = sh.selectExpr("doc_id", "simhash",
      "posexplode(transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535))")
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Exact n-gram Jaccard via the shared-shingle join. */
  def ngramJaccard(spark: SparkSession, sfDir: String, th: Double = 0.05): DataFrame =
    ngramJaccardOn(docs(spark, sfDir), th)

  def ngramJaccardOn(docsDf: DataFrame, th: Double): DataFrame =
    ngramJaccardOnShingles(shingles(docsDf), th)

  def ngramJaccardOnShingles(sh: DataFrame, th: Double): DataFrame = {
    val s = sh.dropDuplicates("doc_id", "shingle")
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val common = s.select(col("doc_id").as("id_a"), col("shingle"))
      .join(s.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("common") / (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= th)
      .select(col("id_a"), col("id_b"), col("common"), col("jaccard"))
  }

  /** Candidate near-dup pairs from the two ANN structures that already
    * exist (Similarity.annLsh hyperplane buckets ∪ annIvf nprobe-2 cells):
    * two equi-self-joins on a narrow key — NEVER an all-pairs product.
    * IVF cell-mates guarantee a non-empty candidate set at any sf (every
    * document lands in one of IvfCells cells), while LSH buckets add the
    * high-precision mates.
    */
  def embeddingCandidatePairs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.spark.VectorExpressions.register(spark)
    graft.spark.VectorExpressions.registerIvfCells(
      spark, Similarity.ivfCentroids(spark, sfDir))
    val keyed = embeddings(spark, sfDir).selectExpr(
      "vec_id",
      """explode(array(concat('L', float_vec_lsh_bucket(embedding)),
        |              concat('C', float_vec_ivf_cell(embedding)),
        |              concat('C', float_vec_ivf_cell2(embedding)))) AS k"""
        .stripMargin.replace("\n", " "))
      .filter(col("k") =!= "C-1") // second probe cell is -1 when only one centroid
    val a = keyed.select(col("k"), col("vec_id").as("id_a"))
    val b = keyed.select(col("k"), col("vec_id").as("id_b"))
    a.join(b, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding cosine near-dup — exact cosine VERIFICATION over the
    * LSH ∪ IVF candidate pairs (VERDICT r02 task 4: the r01/r02 crossJoin
    * baseline was the one remaining O(n²) operator in the driver set; it
    * survives only as the spec-only baseline `embeddingCosineBruteForce`).
    * Dot/norm via the native codegen'd float_vec_dot expression (HOF
    * zip_with/aggregate are interpreted per-element — ~10× slower on
    * 64-dim pairs).
    *
    * Output is the top `topPairs` candidate pairs by cosine (deterministic
    * tie-break on ids) rather than a fixed threshold: a threshold makes
    * the result set vacuously empty on corpora with no near-dups
    * (VERDICT r01), while rank-based output is non-empty (IVF cell-mates
    * always exist) and deterministic at every sf. The top-k runs as
    * TakeOrderedAndProject (per-partition heaps + driver merge), not a
    * global sort; at 100 TB the plan is: two narrow equi-joins keyed on
    * bucket/cell, exact dot products on candidates only.
    */
  def embeddingCosine(spark: SparkSession, sfDir: String, topPairs: Int = 100): DataFrame = {
    graft.spark.VectorExpressions.register(spark)
    val e = embeddings(spark, sfDir).selectExpr(
      "vec_id", "embedding",
      "sqrt(float_vec_dot(embedding, embedding)) AS nrm")
    val pairs = embeddingCandidatePairs(spark, sfDir)
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"),
        col("nrm").as("n_a")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
        col("nrm").as("n_b")), Seq("id_b"))
      .selectExpr("id_a", "id_b",
        "round(float_vec_dot(v_a, v_b) / (n_a * n_b), 4) AS cosine")
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(topPairs)
    pairs.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc))
        .cast("long"))
  }

  /** The O(n²) brute-force baseline — SPEC-ONLY (DedupSpec compares the
    * candidate-verified top pairs against it); not in the driver query
    * set because a cartesian product dies at any real scale.
    */
  def embeddingCosineBruteForce(
      spark: SparkSession, sfDir: String, topPairs: Int = 100): DataFrame = {
    graft.spark.VectorExpressions.register(spark)
    val e = embeddings(spark, sfDir).selectExpr(
      "vec_id", "embedding",
      "sqrt(float_vec_dot(embedding, embedding)) AS nrm")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"), col("nrm").as("n_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"), col("nrm").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .selectExpr("id_a", "id_b",
        "round(float_vec_dot(v_a, v_b) / (n_a * n_b), 4) AS cosine")
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(topPairs)
  }

  /** Composite dedup pipeline — the shape a real pretraining corpus pass
    * takes: exact dedup first (cheap, kills the LSH skew floods), then
    * MinHash+LSH candidates on the survivors, then exact n-gram Jaccard
    * verification of candidates only, greedy min-id keeper. Output: one
    * status row per document.
    *
    * Scale: stage 1 is one hash shuffle; stage 2 the signature groupBy +
    * band join; stage 3 runs only on candidate pairs (broadcastable at
    * realistic dup rates) — never an all-pairs product.
    */
  def dedupPipeline(spark: SparkSession, sfDir: String,
      estTh: Double = 0.5, jaccardTh: Double = 0.8): DataFrame = {
    val d = docs(spark, sfDir).select("doc_id", "text")
    val groups = d.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val withKeeper = d
      .withColumn("h", sha2(col("text"), 256))
      .join(groups, "h")
    val exactRemoved = withKeeper
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit("exact-dup").as("status"), col("keep_id").as("dup_of"))
    // survivors feeds three branches (candidates, verification, keep-list);
    // cache so the exact-dedup stage isn't recomputed per branch (at real
    // scale this is a persisted intermediate table)
    val survivors = withKeeper
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "text")
      .cache()
    // NB the shingle relation is deliberately NOT cached/shared between
    // the signature and verify stages: r03 measured sharing it (cache of
    // the exploded ~n×1.5k-row relation) at 4× SLOWER than recomputing —
    // the explode is cheap codegen off cached survivors, the verify stage
    // explodes only the (small) candidate-doc subset, and materializing
    // the full exploded relation breaks the fused explode→partial-agg
    // pipeline. Recompute wins at every scale where candidates ≪ corpus.
    val candidates = minhashLshOn(survivors, estTh).select("id_a", "id_b").cache()
    val verified = ngramJaccardOn(
      survivors.join(
        candidates.selectExpr("id_a AS doc_id")
          .union(candidates.selectExpr("id_b AS doc_id")).distinct(),
        Seq("doc_id")), th = jaccardTh)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
    val nearRemoved = verified
      .select(greatest(col("id_a"), col("id_b")).as("doc_id"),
        least(col("id_a"), col("id_b")).as("dup_of"))
      .groupBy(col("doc_id")).agg(min(col("dup_of")).as("dup_of"))
      .select(col("doc_id"), lit("near-dup").as("status"), col("dup_of"))
    val removed = exactRemoved.unionByName(nearRemoved)
    d.select("doc_id")
      .join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("kept").as("status"),
        lit(null).cast("long").as("dup_of"))
      .unionByName(removed)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_exact_dedup" -> ((s, d) => exact(s, d)),
    "t6_minhash_lsh" -> ((s, d) => minhashLsh(s, d)),
    "t7_simhash_dedup" -> ((s, d) => simhashDedup(s, d)),
    "t8_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)),
    "t9_embed_cosine_dups" -> ((s, d) => embeddingCosine(s, d)),
    "t13_dedup_pipeline" -> ((s, d) => dedupPipeline(s, d))
  )

  val oracles: Map[String, String] = Map(
    "t1_exact_dedup" ->
      """SELECT sha256(text) AS h, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    // exact n-gram Jaccard is SQL-expressible → strong oracle for a dedup op
    "t8_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |           i -> concat(tk[i], ' ', tk[i + 1], ' ', tk[i + 2]))
        |      ELSE [array_to_string(tk, ' ')] END) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, common,
        |       round(common / (sa.sz + sb.sz - common), 4) AS jaccard
        |FROM common JOIN sizes sa ON sa.doc_id = id_a
        |            JOIN sizes sb ON sb.doc_id = id_b
        |WHERE round(common / (sa.sz + sb.sz - common), 4) >= 0.05""".stripMargin
  )
}
