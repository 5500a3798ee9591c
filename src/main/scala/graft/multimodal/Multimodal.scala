package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a large-scale training-data pipeline: images /
  * audio / video travel as opaque BINARY columns with typed metadata, and
  * every per-byte operator runs as `mapPartitions` over a typed Dataset —
  * the Scala analog of a Pandas-UDF-over-mapInPandas stage: one iterator
  * per partition, rows streamed in batch shape, no per-row UDF dispatch.
  *
  * The reference has no media path at all (SURVEY.md §2.3: no binary
  * types); this module is a north-star extension. The codec itself is
  * STUBBED — this container ships no image/audio libraries — behind
  * [[FakeCodec]], a deterministic stand-in with the same signature,
  * batch shape, and output schema a real (javax.imageio / FFM-based)
  * decoder would have. Everything around the stub — schemas, magic-byte
  * sniffing, size-aware partitioning, resize pooling math, frame
  * sampling — is real and tested (MultimodalSpec).
  *
  * Scale posture (100 TB of media): decode parallelism is sized by
  * BYTES, not row count ([[repartitionForDecode]]) — media rows are
  * wildly skewed (a 4 KB icon vs a 40 MB clip) and a row-count
  * repartition OOMs the unlucky executor. Metadata-only queries
  * (sniffing, frame planning) never touch `content` — column pruning
  * keeps the binary out of the scan entirely.
  */
object Multimodal {

  /** The media table contract: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType), // image/png, audio/wav, video/mp4
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("content", BinaryType)))

  /** Magic-byte container sniffing — real logic, pure expressions (hex of
    * an 12-byte prefix; the binary column is NOT shipped to the driver).
    * Validates or recovers the declared media_type.
    */
  def withSniffedType(df: DataFrame): DataFrame = {
    val pfx = hex(substring(col("content"), 1, 12))
    df.withColumn("sniffed_type",
      when(pfx.startsWith("89504E47"), "image/png")
        .when(pfx.startsWith("FFD8FF"), "image/jpeg")
        .when(pfx.startsWith("52494646") &&
          substring(pfx, 17, 8) === "57415645", "audio/wav") // RIFF....WAVE
        .when(substring(pfx, 9, 8) === "66747970", "video/mp4") // ....ftyp
        .otherwise("application/octet-stream"))
  }

  /** Size-aware repartition ahead of a decode stage: decode memory is
    * bounded by payload bytes, not rows. One cheap metadata action (sum
    * of lengths), then a round-robin repartition into
    * ceil(totalBytes / targetBytesPerPartition) slices.
    */
  def repartitionForDecode(df: DataFrame,
      targetBytesPerPartition: Long): DataFrame = {
    val total = df.agg(coalesce(sum(length(col("content"))), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1L,
      (total + targetBytesPerPartition - 1) / targetBytesPerPartition).toInt
    df.repartition(parts)
  }

  /** Decoded image batch row (what a real decoder would emit: CHW-less
    * grayscale float plane, row-major).
    */
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      pixels: Array[Float])

  /** Audio feature row: fixed-width per-window RMS envelope. */
  final case class AudioFeatures(media_id: Long, n_windows: Int,
      rms: Array[Float])

  /** ======================== STUB BOUNDARY =========================
    * Deterministic fake codec. A real build replaces exactly this
    * object (javax.imageio, a JNI/ffmpeg binding, …) — signatures and
    * shapes are the production ones; the byte→value mapping is fake.
    */
  object FakeCodec {
    /** STUB for image decode: pixel(i) = content[i mod len] / 255 — the
      * real implementation would inflate the compressed payload.
      */
    def decodeImage(content: Array[Byte], width: Int,
        height: Int): Array[Float] = {
      val n = width * height
      val out = new Array[Float](n)
      if (content.nonEmpty) {
        var i = 0
        while (i < n) {
          out(i) = (content(i % content.length) & 0xff) / 255f
          i += 1
        }
      }
      out
    }

    /** STUB for PCM decode: sample(i) = signed byte at i mod len / 128. */
    def decodeAudio(content: Array[Byte], nSamples: Int): Array[Float] = {
      val out = new Array[Float](nSamples)
      if (content.nonEmpty) {
        var i = 0
        while (i < nSamples) {
          out(i) = content(i % content.length) / 128f
          i += 1
        }
      }
      out
    }
  }
  /* ======================= END STUB BOUNDARY ======================= */

  /** Decode stage: (media_id, width, height, content) → DecodedImage,
    * one streamed iterator per partition (mapInPandas batch shape).
    */
  def decodeImages(df: DataFrame): Dataset[DecodedImage] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("width"), col("height"), col("content"))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, w, h, c) =>
        DecodedImage(id, w, h, FakeCodec.decodeImage(c, w, h))
      })
  }

  /** Resize by average pooling — REAL math over the decoded plane (the
    * part a real pipeline keeps when swapping the codec). Output pixel
    * (x,y) averages its source box; exact for integer scale factors.
    */
  def resizeImages(decoded: Dataset[DecodedImage], newW: Int,
      newH: Int): Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { img =>
      val out = new Array[Float](newW * newH)
      var y = 0
      while (y < newH) {
        val y0 = y * img.height / newH
        val y1 = math.max(y0 + 1, (y + 1) * img.height / newH)
        var x = 0
        while (x < newW) {
          val x0 = x * img.width / newW
          val x1 = math.max(x0 + 1, (x + 1) * img.width / newW)
          var acc = 0f
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) { acc += img.pixels(yy * img.width + xx); xx += 1 }
            yy += 1
          }
          out(y * newW + x) = acc / ((y1 - y0) * (x1 - x0))
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, newW, newH, out)
    })
  }

  /** Audio feature extraction: windowed RMS envelope over (stub-)decoded
    * PCM — decode stub, envelope math real.
    */
  def audioFeatures(df: DataFrame, windowSize: Int = 256): Dataset[AudioFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("sample_rate"), col("duration_ms"),
        col("content"))
      .as[(Long, Int, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, rate, durMs, c) =>
        val nSamples = (rate.toLong * durMs / 1000).toInt
        val pcm = FakeCodec.decodeAudio(c, nSamples)
        val nWin = math.max(1, nSamples / windowSize)
        val rms = new Array[Float](nWin)
        var w = 0
        while (w < nWin) {
          var acc = 0d
          var i = w * windowSize
          val end = math.min((w + 1) * windowSize, nSamples)
          while (i < end) { acc += pcm(i).toDouble * pcm(i); i += 1 }
          rms(w) = math.sqrt(acc / math.max(1, end - w * windowSize)).toFloat
          w += 1
        }
        AudioFeatures(id, nWin, rms)
      })
  }

  /** Frame-sample plan for video rows: one row per frame timestamp every
    * `everyMs` — pure metadata (sequence + explode), the binary column
    * is never read, so the scan prunes it entirely. The decode of each
    * planned frame is the same [[FakeCodec]] stub boundary.
    */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("media_type").startsWith("video/"))
      // duration 0 (zero-length or metadata-less row) yields no frames;
      // without the guard sequence(0, -1, +step) throws and kills the
      // whole plan.
      .filter(col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(expr(s"sequence(0L, duration_ms - 1, ${everyMs}L)"))
          .as("frame_ts_ms"))
}
