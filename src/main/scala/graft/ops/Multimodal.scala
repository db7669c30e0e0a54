package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * Decode status (VERDICT r01 task 9):
  *  - image/png — REAL decode via javax.imageio (pure JVM, headless):
  *    features = normalized 16-bin luminance histogram of actual pixels.
  *  - audio/wav — REAL decode of PCM WAV (RIFF header + 16-bit samples
  *    parsed directly): features = normalized 16-bin amplitude histogram.
  *  - video/mp4 — still a documented stub (`stubDecode`, byte histogram):
  *    no video codec exists in this sandbox. The plumbing around it
  *    (binary columns, per-partition batch init, features-only shuffle)
  *    is identical to the real paths.
  *
  * Scale posture: decode runs inside mapPartitions so codec/model init
  * amortizes per partition; binary blobs never enter a shuffle — only the
  * small feature rows do.
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

  // ------------------------------------------------------------ synthesis

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** A real PNG with deterministic pixels keyed off `id` (pure JVM). */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = splitmix64(id * 1000003L + y.toLong * w + x)
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real PCM WAV (16-bit mono 8 kHz) with a deterministic id-keyed
    * tone + noise mix.
    */
  def synthWav(id: Long, nSamples: Int = 2048): Array[Byte] = {
    val sampleRate = 8000
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val freq = 100.0 + (id % 37) * 20.0
    var i = 0
    while (i < nSamples) {
      val tone = math.sin(2 * math.Pi * freq * i / sampleRate)
      val noise = ((splitmix64(id * 31 + i) >>> 40).toInt - (1 << 23)) / (1 << 23).toDouble
      val s = ((tone * 0.7 + noise * 0.3) * 20000).toInt
        .max(Short.MinValue.toInt).min(Short.MaxValue.toInt)
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  // --------------------------------------------------------------- decode

  /** Real PNG decode → normalized 16-bin luminance histogram; None if the
    * payload is not a decodable image.
    */
  def decodeImageFeatures(payload: Array[Byte]): Option[Array[Double]] = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val f = new Array[Double](FeatDim)
      val w = img.getWidth
      val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          f(lum * FeatDim / 256) += 1.0
          x += 1
        }
        y += 1
      }
      val n = math.max(w.toLong * h, 1L).toDouble
      var j = 0
      while (j < FeatDim) { f(j) /= n; j += 1 }
      Some(f)
    }
  }

  /** Real PCM WAV decode (RIFF parse, 16-bit samples) → normalized 16-bin
    * amplitude histogram; None if not a PCM WAV.
    */
  def decodeWavFeatures(payload: Array[Byte]): Option[Array[Double]] = {
    if (payload.length < 44 ||
        !(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
          payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E')) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // walk chunks from offset 12 to find 'data'; a corrupt/adversarial
    // chunk length (negative, or padded length overflowing) must not stall
    // the walk — reject instead of looping forever in an executor task
    // (ADVICE r02)
    var pos = 12
    var dataPos = -1
    var dataLen = 0
    while (pos + 8 <= payload.length && dataPos < 0) {
      val cid = new String(payload, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4)
      if (cid == "data") {
        if (clen < 0) return None
        dataPos = pos + 8; dataLen = clen
      } else {
        val next = pos.toLong + 8L + clen.toLong + (clen & 1)
        if (clen < 0 || next <= pos) return None
        if (next > Int.MaxValue) return None
        pos = next.toInt
      }
    }
    if (dataPos < 0) return None
    val end = math.min(dataPos + dataLen, payload.length)
    val f = new Array[Double](FeatDim)
    var i = dataPos
    var n = 0L
    while (i + 1 < end) {
      val s = buf.getShort(i).toInt
      f(((s + 32768) * FeatDim) >>> 16) += 1.0
      i += 2
      n += 1
    }
    if (n == 0) return None
    var j = 0
    while (j < FeatDim) { f(j) /= n.toDouble; j += 1 }
    Some(f)
  }

  /** STUB decode for codec-less media types (video): a deterministic
    * byte-histogram projection with the same shape contract (FeatDim
    * floats, L2 norm) so the pipeline is testable end-to-end.
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

  /** Route a payload to its decoder; falls back to the stub when the
    * payload is not decodable for its declared type.
    */
  def decode(mediaType: String, payload: Array[Byte]): Array[Double] =
    (mediaType match {
      case t if t.startsWith("image/") => decodeImageFeatures(payload)
      case t if t.startsWith("audio/") => decodeWavFeatures(payload)
      case _ => None
    }).getOrElse(stubDecode(payload))

  /** Synthesize a deterministic media table from `documents`: image rows
    * carry REAL PNG bytes, audio rows REAL PCM WAV bytes (both id-keyed),
    * video rows an opaque blob (text bytes) for the stub path.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val w = 32 + (id % 8).toInt * 4
        val h = 32 + (id % 5).toInt * 4
        (id % 3) match {
          case 0 => MediaRow(id, "image/png", synthPng(id, w, h), w, h)
          case 1 => MediaRow(id, "audio/wav", synthWav(id), 0, 0)
          case _ => MediaRow(id, "video/mp4", text.getBytes("UTF-8"), 0, 0)
        }
      }
  }

  /** Per-partition batched feature extraction (decoder init once per
    * partition — the mapInPandas/mapPartitions batch shape).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // decoder/codec/model initialization would happen HERE, once per batch
      it.map { r =>
        val feat = decode(r.media_type, r.payload)
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
