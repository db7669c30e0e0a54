package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (`stubDecode`) — but the Spark-side
  * plumbing is real and tested: schema, binary column handling, partition
  * batching, feature vector shape, and the downstream aggregation are
  * exactly what a real decoder would plug into (swap `stubDecode` for an
  * actual codec; at 100 TB the same mapPartitions batches amortize model /
  * codec init per partition, and binary blobs never enter a shuffle — only
  * the small feature rows do).
  */
object Multimodal {

  val FeatDim = 16

  final case class MediaRow(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      feat: Array[Double],
      feat_norm: Double)

  /** Synthesize a deterministic media table from `documents`: payload =
    * UTF-8 bytes of the text standing in for an encoded image/audio blob.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val mt = (id % 3) match {
          case 0 => "image/png"; case 1 => "audio/wav"; case _ => "video/mp4"
        }
        MediaRow(id, mt, text.getBytes("UTF-8"), 64 + (id % 16).toInt * 8,
          64 + (id % 9).toInt * 8)
      }
  }

  /** STUB decode/feature-extract: a real implementation would decode the
    * payload (libjpeg/ffmpeg/…) and run a feature model; here it is a
    * deterministic byte-histogram projection so the pipeline is testable
    * end-to-end. Shape contract (FeatDim floats, L2 norm) is the real one.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val f = new Array[Double](FeatDim)
    var i = 0
    while (i < payload.length) {
      f((payload(i) & 0xff) % FeatDim) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    var j = 0
    while (j < FeatDim) { f(j) = f(j) / n; j += 1 }
    f
  }

  /** Per-partition batched feature extraction (decoder init once per
    * partition — the mapInPandas/mapPartitions batch shape).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // decoder/codec/model initialization would happen HERE, once per batch
      it.map { r =>
        val feat = stubDecode(r.payload)
        val norm = math.sqrt(feat.map(x => x * x).sum)
        MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong, feat,
          math.rint(norm * 10000) / 10000)
      }
    }
  }

  /** Query entry: features + per-media-type rollup-friendly columns. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        round(col("feat_norm"), 4).as("feat_norm"),
        size(col("feat")).cast("long").as("feat_dim"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t12_media_features" -> ((s, d) => mediaFeatures(s, d))
  )
}
