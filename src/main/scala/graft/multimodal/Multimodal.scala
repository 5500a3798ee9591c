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
  * types); this module is a north-star extension. Image and audio decode
  * are REAL: [[Codec]] wraps the JDK's own codecs — `javax.imageio`
  * (PNG/JPEG/BMP/GIF) and `javax.sound.sampled` (WAV/PCM) ship with
  * every JRE, so decode needs zero external dependencies. Video
  * CONTAINER metadata is real too — [[Codec.parseMp4Meta]] walks the
  * ISO BMFF box structure, so duration/timescale/dimensions and the
  * frame plan ([[frameSamplePlanFromContent]]) derive from the payload
  * itself. The one remaining stub boundary is the video BITSTREAM:
  * no H.264/VP9 codec exists in the JDK, so planned frames hand off to
  * an external decoder in a real deployment.
  *
  * Scale posture (100 TB of media): decode parallelism is sized by
  * BYTES, not row count ([[repartitionForDecode]]) — media rows are
  * wildly skewed (a 4 KB icon vs a 40 MB clip) and a row-count
  * repartition OOMs the unlucky executor. Metadata-only queries
  * (sniffing, frame planning) never touch `content` — column pruning
  * keeps the binary out of the scan entirely. Decode failures are data,
  * not exceptions: undecodable payloads surface as dropped rows a
  * side audit can count, never as a task-killing throw.
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

  /** Decoded image row: grayscale float plane in [0,1], row-major, with
    * the dimensions read from the payload itself (not trusted metadata).
    */
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      pixels: Array[Float])

  /** Audio feature row: fixed-width per-window RMS envelope. */
  final case class AudioFeatures(media_id: Long, n_windows: Int,
      rms: Array[Float])

  /** Video container metadata row, derived from the PAYLOAD (the
    * [[DecodedImage]] doctrine — nothing trusted from sidecar
    * columns). duration_ms = duration · 1000 / timescale, exact
    * integer division. Unparseable rows are poisoned (-1 markers).
    */
  final case class VideoMeta(media_id: Long, timescale: Int,
      duration: Long, duration_ms: Long, width: Int, height: Int)

  /** Real JDK codecs. Everything here is executor-side, allocation-lean,
    * and total: malformed payloads return None instead of throwing (a
    * poisoned row must not kill a 100 TB decode stage).
    *
    * Thread-safety: `ImageIO.read`/`AudioSystem.getAudioInputStream`
    * construct fresh reader instances per call — safe under Spark's
    * many-tasks-per-JVM execution. `ImageIO.setUseCache(false)` keeps
    * the codec off the local disk (the default spills >8 KB streams to
    * temp files — pure overhead for in-memory byte arrays).
    */
  object Codec {
    javax.imageio.ImageIO.setUseCache(false)

    // -- images (javax.imageio: PNG/JPEG/BMP/GIF) -----------------------

    /** Decode to an 8-bit grayscale plane: (width, height, pixel 0-255
      * ints, row-major). Color inputs are converted through the JDK's
      * own TYPE_BYTE_GRAY color pipeline; grayscale inputs round-trip
      * bit-exactly (PNG is lossless).
      */
    def decodeGray8(content: Array[Byte]): Option[(Int, Int, Array[Int])] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        if (img == null) None // no registered reader claimed the bytes
        else {
          val w = img.getWidth
          val h = img.getHeight
          val gray =
            if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              img
            else {
              val g = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val gc = g.createGraphics()
              try gc.drawImage(img, 0, 0, null) finally gc.dispose()
              g
            }
          val px = gray.getRaster.getSamples(0, 0, w, h, 0,
            null: Array[Int])
          Some((w, h, px))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Encode an 8-bit grayscale plane as PNG (lossless — the decode
      * side reads back the exact sample values). `pixel(x, y)` must
      * return 0-255.
      */
    def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, pixel(x, y)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    // -- audio (javax.sound.sampled: WAV/PCM) ---------------------------

    /** Decode a WAV payload to (sampleRate, 16-bit signed samples,
      * channel-0 only). Non-PCM or malformed payloads → None. The JDK
      * parses the RIFF/fmt/data chunk structure; this only unpacks the
      * little-endian frames.
      */
    def decodePcm16(content: Array[Byte]): Option[(Int, Array[Int])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = in.readAllBytes()
            val frameSize = fmt.getFrameSize // 2 * channels
            val n = bytes.length / frameSize
            val out = new Array[Int](n)
            val le = !fmt.isBigEndian
            var i = 0
            while (i < n) {
              val o = i * frameSize // channel 0 = first 2 bytes of frame
              out(i) =
                if (le) ((bytes(o + 1) << 8) | (bytes(o) & 0xff))
                else ((bytes(o) << 8) | (bytes(o + 1) & 0xff))
              i += 1
            }
            Some((fmt.getSampleRate.toInt, out))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Deflate-compressed size of a byte payload (level 6, raw stream,
      * deterministic for a given JDK zlib) — the compression-ratio
      * quality signal's kernel (q69). Counts bytes without keeping the
      * compressed output. The Deflater (native zlib state) and scratch
      * buffer are pooled per thread — one Spark task = one thread, so
      * the hot corpus scan pays reset(), not native init/teardown, per
      * row. The pooled Deflater is deliberately never end()ed: its
      * native zlib state (~256 KiB) lives for the owning task thread's
      * lifetime, bounded by the executor thread count — executors with
      * fixed thread pools (the Spark default) make this a constant, not
      * a leak.
      */
    private val deflaterLocal =
      new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
        override def initialValue(): (java.util.zip.Deflater, Array[Byte]) =
          (new java.util.zip.Deflater(6, true), new Array[Byte](8192))
      }

    def deflatedSize(raw: Array[Byte]): Long = {
      val (d, buf) = deflaterLocal.get()
      d.reset()
      d.setInput(raw)
      d.finish()
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    }

    /** Encode 16-bit signed mono PCM as a canonical 44-byte-header WAV.
      * (Kept by hand rather than via AudioSystem.write so tests and
      * synthetic corpora control the exact container layout.)
      */
    def encodeWavPcm16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i).toShort); i += 1 }
      buf.array()
    }

    // -- video containers (ISO BMFF / MP4 box structure) ----------------
    //
    // The video pillar's stub boundary is the BITSTREAM (the JDK ships
    // no H.264/VP9 decoder); the CONTAINER is plain length-prefixed
    // big-endian box structure — walkable with nothing but byte reads —
    // so duration, timescale, and track dimensions derive from the
    // payload itself, exactly like image dims (q64) and sample rates
    // (q65). ISO/IEC 14496-12: boxes are (u32 size, 4cc type, content);
    // size 1 = 64-bit largesize follows, size 0 = box runs to the end
    // of its container; unknown boxes are skipped by their declared
    // size (the format's own forward-compatibility rule).

    /** Parse (movie timescale, movie duration, track width, track
      * height) from an MP4/ISO BMFF payload — mvhd (version 0 or 1)
      * inside moov, dimensions from the first tkhd with nonzero 16.16
      * width/height (fallback: the first tkhd; (0, 0) when no track
      * header parses). None when no readable moov/mvhd exists or a box
      * size lies about its container. Real box walking, not an offset
      * table: a `free` box before moov or an unknown child between
      * mvhd and trak must not matter.
      */
    def parseMp4Meta(content: Array[Byte]): Option[(Int, Long, Int, Int)] =
      try {
        def u32(o: Int): Long =
          ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
            ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
        def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
        def typ(o: Int): String = new String(content, o, 4, "US-ASCII")
        // children of [from, to): (type, contentFrom, contentTo); a
        // malformed size (overruns the container, or smaller than its
        // own header) stops the walk at what parsed so far
        def children(from: Int, to: Int): Seq[(String, Int, Int)] = {
          val out = scala.collection.mutable
            .ArrayBuffer.empty[(String, Int, Int)]
          var o = from
          var ok = true
          while (ok && o + 8 <= to) {
            val sz = u32(o)
            val (hdr, size): (Int, Long) =
              if (sz == 1L)
                if (o + 16 <= to) (16, u64(o + 8)) else (8, -1L)
              else if (sz == 0L) (8, (to - o).toLong)
              else (8, sz)
            if (size < hdr || o + size > to) ok = false
            else {
              out += ((typ(o + 4), o + hdr, (o + size).toInt))
              o = (o + size).toInt
            }
          }
          out.toSeq
        }
        children(0, content.length).find(_._1 == "moov")
          .flatMap { case (_, ms, me) =>
            val kids = children(ms, me)
            val mvhd = kids.find(_._1 == "mvhd")
              .flatMap { case (_, s, e) =>
                val v = content(s) & 0xff
                if (v == 0 && e - s >= 20)
                  Some((u32(s + 12).toInt, u32(s + 16)))
                else if (v == 1 && e - s >= 32)
                  Some((u32(s + 20).toInt, u64(s + 24)))
                else None
              }
            val dims = kids.filter(_._1 == "trak").flatMap {
              case (_, s, e) =>
                children(s, e).find(_._1 == "tkhd").flatMap {
                  case (_, ts, te) =>
                    val v = content(ts) & 0xff
                    if (v == 0 && te - ts >= 84)
                      Some(((u32(ts + 76) >> 16).toInt,
                        (u32(ts + 80) >> 16).toInt))
                    else if (v == 1 && te - ts >= 96)
                      Some(((u32(ts + 88) >> 16).toInt,
                        (u32(ts + 92) >> 16).toInt))
                    else None
                }
            }
            val (w, h) = dims.find(d => d._1 > 0 && d._2 > 0)
              .orElse(dims.headOption).getOrElse((0, 0))
            mvhd.map { case (tsc, dur) => (tsc, dur, w, h) }
          }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** One ISO BMFF box: u32 size + 4-char type + content. */
    private def box(t: String, content: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + content.length)
      b.putInt(8 + content.length).put(t.getBytes("US-ASCII"))
        .put(content)
      b.array()
    }

    /** Parse the per-sample byte sizes of the FIRST track carrying an
      * `stsz` box (moov → trak → mdia → minf → stbl → stsz — the walk
      * [[parseMp4Meta]] stops one level above). Both stsz forms: the
      * uniform-size header (sample_size ≠ 0 — every sample that size)
      * and the per-sample u32 table. None when no readable stsz
      * exists, a box size lies about its container, or the table
      * overruns its box. The sample-size stream is the container's
      * own BYTE-RATE PROFILE of the bitstream — it survives re-muxing,
      * timestamp re-stamping, and metadata edits untouched, which is
      * exactly what [[Multimodal.videoHash64]] fingerprints without
      * ever decoding a frame.
      */
    def parseMp4SampleSizes(content: Array[Byte]): Option[Array[Long]] =
      try {
        def u32(o: Int): Long =
          ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
            ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
        def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
        def typ(o: Int): String = new String(content, o, 4, "US-ASCII")
        def children(from: Int, to: Int): Seq[(String, Int, Int)] = {
          val out = scala.collection.mutable
            .ArrayBuffer.empty[(String, Int, Int)]
          var o = from
          var ok = true
          while (ok && o + 8 <= to) {
            val sz = u32(o)
            val (hdr, size): (Int, Long) =
              if (sz == 1L)
                if (o + 16 <= to) (16, u64(o + 8)) else (8, -1L)
              else if (sz == 0L) (8, (to - o).toLong)
              else (8, sz)
            if (size < hdr || o + size > to) ok = false
            else {
              out += ((typ(o + 4), o + hdr, (o + size).toInt))
              o = (o + size).toInt
            }
          }
          out.toSeq
        }
        def child(in: Seq[(String, Int, Int)],
            t: String): Option[(Int, Int)] =
          in.find(_._1 == t).map { case (_, s, e) => (s, e) }
        children(0, content.length).find(_._1 == "moov")
          .map { case (_, ms, me) => children(ms, me) }
          .toSeq.flatten.filter(_._1 == "trak")
          .flatMap { case (_, ts, te) =>
            child(children(ts, te), "mdia")
              .flatMap { case (s, e) => child(children(s, e), "minf") }
              .flatMap { case (s, e) => child(children(s, e), "stbl") }
              .flatMap { case (s, e) => child(children(s, e), "stsz") }
          }
          .headOption
          .flatMap { case (s, e) =>
            if (e - s < 12) None
            else {
              val uniform = u32(s + 4)
              val n = u32(s + 8)
              // the uniform form carries NO table, so the count is
              // unbounded by the file size — a 12-byte corrupt header
              // must not drive a GB allocation (OutOfMemoryError is
              // fatal, not NonFatal); 2^22 samples ≈ 19 h at 60 fps,
              // beyond it the header is treated as malformed. The
              // per-sample branch is file-size-bounded by its table.
              if (n < 0 || (uniform != 0L && n > (1L << 22))) None
              else if (uniform != 0L)
                Some(Array.fill(n.toInt)(uniform))
              else if (s + 12 + 4L * n > e) None
              else Some(Array.tabulate(n.toInt)(i => u32(s + 12 + 4 * i)))
            }
          }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Minimal deterministic MP4 metadata skeleton — ftyp + free +
      * moov(mvhd + udta + trak(tkhd)), version-0 boxes, no media data;
      * synthetic corpora and specs control the exact container layout
      * (the [[encodeWavPcm16]] doctrine). The udta box is deliberate
      * unknown-content the parser must skip by size.
      */
    def encodeMp4Meta(timescale: Int, duration: Long, width: Int,
        height: Int): Array[Byte] = {
      val unity = Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      val mvhd = {
        val b = java.nio.ByteBuffer.allocate(100)
        b.putInt(0) // version 0 + flags
          .putInt(0).putInt(0) // creation, modification
          .putInt(timescale).putInt(duration.toInt)
          .putInt(0x00010000) // rate 1.0
          .putShort(0x0100.toShort).putShort(0) // volume, reserved
          .putLong(0L) // reserved
        unity.foreach(v => b.putInt(v))
        (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
        b.putInt(2) // next_track_ID
        box("mvhd", b.array())
      }
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(0x00000007) // version 0 + flags (enabled, in movie)
          .putInt(0).putInt(0) // creation, modification
          .putInt(1) // track_ID
          .putInt(0) // reserved
          .putInt(duration.toInt)
          .putLong(0L) // reserved
          .putShort(0).putShort(0) // layer, alternate_group
          .putShort(0).putShort(0) // volume (0 for video), reserved
        unity.foreach(v => b.putInt(v))
        b.putInt(width << 16).putInt(height << 16)
        box("tkhd", b.array())
      }
      val udta = box("udta", Array.fill(6)(0x55.toByte))
      val moov = box("moov", mvhd ++ udta ++ box("trak", tkhd))
      val ftyp = box("ftyp", {
        val b = java.nio.ByteBuffer.allocate(16)
        b.put("isom".getBytes("US-ASCII")).putInt(0x200)
          .put("isom".getBytes("US-ASCII"))
          .put("mp41".getBytes("US-ASCII"))
        b.array()
      })
      ftyp ++ box("free", Array.fill(12)(0.toByte)) ++ moov
    }

    /** [[encodeMp4Meta]] extended with a sample table — the trak gains
      * mdia(minf(stbl(stsz + stco))), so [[parseMp4SampleSizes]] has a
      * real per-sample byte-size stream to walk (the fingerprint
      * input). `remuxPadding > 0` emits a RE-MUX of the same media:
      * an extra free box of that size and the udta moved after the
      * trak — byte-different container, identical stsz — exactly the
      * duplicate class a byte hash misses and [[Multimodal
      * .videoHash64]] must collapse (MultimodalSpec pins it). The stco
      * offsets are synthetic (there is no mdat): deterministic
      * 4-byte-per-chunk placeholders the parser never reads.
      */
    def encodeMp4WithSamples(timescale: Int, duration: Long, width: Int,
        height: Int, sampleSizes: Array[Int],
        remuxPadding: Int = 0): Array[Byte] = {
      val bare = encodeMp4Meta(timescale, duration, width, height)
      // splice: rebuild from the bare skeleton's parts rather than
      // re-encoding mvhd/tkhd (ONE writer for the shared boxes)
      def u32(a: Array[Byte], o: Int): Int =
        ((a(o) & 0xff) << 24) | ((a(o + 1) & 0xff) << 16) |
          ((a(o + 2) & 0xff) << 8) | (a(o + 3) & 0xff)
      def part(a: Array[Byte], from: Int): (String, Array[Byte], Int) = {
        val sz = u32(a, from)
        (new String(a, from + 4, 4, "US-ASCII"),
          java.util.Arrays.copyOfRange(a, from + 8, from + sz), from + sz)
      }
      val (t1, ftyp, o1) = part(bare, 0)
      val (_, _, o2) = part(bare, o1) // the skeleton's free box
      val (t3, moovC, _) = part(bare, o2)
      require(t1 == "ftyp" && t3 == "moov", "skeleton layout changed")
      val (tm1, mvhd, m1) = part(moovC, 0)
      val (tm2, udta, m2) = part(moovC, m1)
      val (tm3, trakC, _) = part(moovC, m2)
      // the splice is positional — assert the destructured child types
      // too, or a reordered skeleton would silently mislabel mvhd/udta/
      // trak and re-wrap them into a malformed container
      require(tm1 == "mvhd" && tm2 == "udta" && tm3 == "trak",
        s"skeleton moov layout changed ($tm1/$tm2/$tm3)")
      val stsz = {
        val b = java.nio.ByteBuffer.allocate(12 + 4 * sampleSizes.length)
        b.putInt(0) // version + flags
          .putInt(0) // sample_size 0: per-sample table follows
          .putInt(sampleSizes.length)
        sampleSizes.foreach(b.putInt)
        box("stsz", b.array())
      }
      val stco = {
        val b = java.nio.ByteBuffer.allocate(8 + 4)
        b.putInt(0).putInt(1) // one placeholder chunk offset
        b.putInt(0)
        box("stco", b.array())
      }
      val mdia = box("mdia", box("minf", box("stbl", stsz ++ stco)))
      val trak = box("trak", trakC ++ mdia)
      val moov =
        if (remuxPadding > 0) box("moov", box("mvhd", mvhd) ++ trak ++
          box("udta", udta))
        else box("moov", box("mvhd", mvhd) ++ box("udta", udta) ++ trak)
      val pad =
        if (remuxPadding > 0)
          box("free", Array.fill(remuxPadding)(0x20.toByte))
        else box("free", Array.fill(12)(0.toByte))
      box("ftyp", ftyp) ++ pad ++ moov
    }
  }

  /** Decode stage: content → DecodedImage, one streamed iterator per
    * partition (mapInPandas batch shape). Dimensions come from the
    * payload, not the metadata columns; undecodable rows are dropped
    * (audit by anti-joining media_ids against the input).
    */
  def decodeImages(df: DataFrame): Dataset[DecodedImage] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.decodeGray8(c).map { case (w, h, px) =>
          val f = new Array[Float](px.length)
          var i = 0
          while (i < px.length) { f(i) = px(i) / 255f; i += 1 }
          DecodedImage(id, w, h, f)
        }
      })
  }

  /** Resize by average pooling — real math over the decoded plane.
    * Output pixel (x,y) averages its source box; exact for integer
    * scale factors.
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

  /** 64-bit perceptual average-hash (aHash) over decoded grayscale
    * planes — the image analog of q29's SimHash: pool the image to an
    * 8×8 grid of box means and set bit j when box j's mean exceeds the
    * global mean. Re-encoded, block-upscaled, or mildly brightness-
    * perturbed copies of an image land on the same (or Hamming-close)
    * hash, so the text dedup machinery (exact groupBy, banded near-dup
    * join) applies unchanged to image columns.
    *
    * All-integer: pixels are recovered exactly from the decode plane
    * (round(p·255) — the q66 fixed-point trick), box sums accumulate in
    * Long, and the bit rule is the cross-multiplied comparison
    * `boxSum·totalCnt > totalSum·boxCnt` — no division, exact for any
    * dimensions (safe to ~8k×8k before Long overflow). Box boundaries
    * floor-divide like [[resizeImages]]; for dimensions that are
    * multiples of 8 every box pools a uniform (w/8)×(h/8) block.
    *
    * The hash is emitted as four 16-bit bands (band0 = bits 0-15 …
    * band3 = bits 48-63) rather than one 64-bit value: bands are the
    * unit the near-dup join buckets on (pigeonhole: Hamming ≤ 3 over
    * 64 bits ⇒ ≥ 1 of 4 bands exactly equal), and staying under 2^16
    * keeps every value exact in any engine's integer type. Hamming
    * distance = Σ bit_count(bandA xor bandB) over the four bands.
    *
    * Scale posture: one streamed pass per partition (mapPartitions, the
    * decode stage's batch shape); only (media_id, 4 ints) leaves the
    * stage — never a pixel plane, never a driver round trip.
    */
  def aHash64(decoded: Dataset[DecodedImage]): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { img =>
      val w = img.width
      val h = img.height
      val boxSum = new Array[Long](64)
      val boxCnt = new Array[Long](64)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val j = by * 8 + x * 8 / w
          boxSum(j) += math.round(img.pixels(y * w + x) * 255f).toLong
          boxCnt(j) += 1
          x += 1
        }
        y += 1
      }
      var ts = 0L
      var tc = 0L
      var j = 0
      while (j < 64) { ts += boxSum(j); tc += boxCnt(j); j += 1 }
      val bands = new Array[Int](4)
      j = 0
      while (j < 64) {
        if (boxSum(j) * tc > ts * boxCnt(j)) bands(j / 16) |= 1 << (j % 16)
        j += 1
      }
      (img.media_id, bands(0), bands(1), bands(2), bands(3))
    }).toDF("media_id", "band0", "band1", "band2", "band3")
  }

  /** Integer image-quality facts of a decoded plane — the measurement
    * half of a LAION/DataComp-style image filter (too-small, extreme
    * aspect, near-constant, too-dark/too-bright media are dropped
    * before any training set): payload-derived dimensions, the exact
    * pixel sum (brightness numerator), and the count of DISTINCT
    * 8-bit values present (a 256-cell presence histogram — the cheap
    * entropy proxy: a constant or 2-tone plane cannot pass a
    * distinct-values floor). All integers recovered exactly from the
    * decode plane (the q66 fixed-point trick), so any threshold rule
    * composed on top is oracle-exact. One streamed pass per partition;
    * only (media_id, 4 ints) leaves the stage.
    */
  def imageQualityMetrics(decoded: Dataset[DecodedImage]): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { img =>
      val seen = new Array[Boolean](256)
      var sum = 0L
      var nDistinct = 0L
      var i = 0
      while (i < img.pixels.length) {
        val v = math.round(img.pixels(i) * 255f).toInt
        sum += v
        if (!seen(v)) { seen(v) = true; nDistinct += 1 }
        i += 1
      }
      (img.media_id, img.width, img.height, sum, nDistinct)
    }).toDF("media_id", "width", "height", "px_sum", "n_distinct")
  }

  /** One-pass image PROFILE: the [[aHash64]] bands AND the
    * [[imageQualityMetrics]] facts from a single walk over the decoded
    * plane — the staged curation feed's kernel (quality gate → exact
    * store → near store all want per-image numbers, and at 100 TB the
    * decode is the cost, so it must run ONCE per payload).
    */
  def imageProfile(decoded: Dataset[DecodedImage]): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { img =>
      val w = img.width
      val h = img.height
      val boxSum = new Array[Long](64)
      val boxCnt = new Array[Long](64)
      val seen = new Array[Boolean](256)
      var sum = 0L
      var nDistinct = 0L
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val v = math.round(img.pixels(y * w + x) * 255f).toInt
          val j = by * 8 + x * 8 / w
          boxSum(j) += v
          boxCnt(j) += 1
          sum += v
          if (!seen(v)) { seen(v) = true; nDistinct += 1 }
          x += 1
        }
        y += 1
      }
      var ts = 0L
      var tc = 0L
      var j = 0
      while (j < 64) { ts += boxSum(j); tc += boxCnt(j); j += 1 }
      val bands = new Array[Int](4)
      j = 0
      while (j < 64) {
        if (boxSum(j) * tc > ts * boxCnt(j)) bands(j / 16) |= 1 << (j % 16)
        j += 1
      }
      (img.media_id, bands(0), bands(1), bands(2), bands(3),
        w, h, sum, nDistinct)
    }).toDF("media_id", "band0", "band1", "band2", "band3",
      "width", "height", "px_sum", "n_distinct")
  }

  /** One-pass audio PROFILE — [[audioHash64]]'s bands AND
    * [[audioQualityMetrics]]' facts from a single PCM walk, the audio
    * kernel of the staged curation feed.
    */
  def audioProfile(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.decodePcm16(c).map { case (rate, pcm) =>
          val n = pcm.length
          val es = new Array[Long](64)
          val cs = new Array[Long](64)
          var clipped = 0L
          var i = 0
          while (i < n) {
            val s = pcm(i)
            val j = (i.toLong * 64 / n).toInt
            es(j) += s.toLong * s
            cs(j) += 1
            if (s >= 32760 || s <= -32760) clipped += 1
            i += 1
          }
          var te = 0L
          var tc = 0L
          var j = 0
          while (j < 64) { te += es(j); tc += cs(j); j += 1 }
          val bands = new Array[Int](4)
          j = 0
          while (j < 64) {
            if (BigInt(es(j)) * tc > BigInt(te) * cs(j))
              bands(j / 16) |= 1 << (j % 16)
            j += 1
          }
          (id, bands(0), bands(1), bands(2), bands(3),
            rate, n.toLong, clipped, te)
        }
      }).toDF("media_id", "band0", "band1", "band2", "band3",
        "sample_rate", "n_samples", "n_clipped", "energy")
  }

  /** Integer audio-quality facts of a PCM payload — the audio flank:
    * sample count and container rate (duration derives exactly),
    * CLIPPED samples (|s| ≥ 32760 — a recording that slams the rail
    * was over-driven at capture or transcode), and the exact energy
    * sum (the silence test's numerator: mean energy below a floor
    * means there is nothing to learn from). Undecodable payloads drop,
    * like [[decodeImages]].
    */
  def audioQualityMetrics(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.decodePcm16(c).map { case (rate, pcm) =>
          var clipped = 0L
          var energy = 0L
          var i = 0
          while (i < pcm.length) {
            val s = pcm(i)
            if (s >= 32760 || s <= -32760) clipped += 1
            energy += s.toLong * s
            i += 1
          }
          (id, rate, pcm.length.toLong, clipped, energy)
        }
      }).toDF("media_id", "sample_rate", "n_samples", "n_clipped",
        "energy")
  }

  /** 64-bit audio fingerprint — [[aHash64]]'s pattern over the time
    * axis: decode PCM ([[Codec.decodePcm16]]), split the sample stream
    * into 64 frames (floor boundaries, uniform when the length divides
    * by 64), accumulate each frame's exact integer ENERGY (Σ s², Long),
    * and set bit j when frame j's mean energy exceeds the stream's
    * mean — the cross-multiplied integer comparison, evaluated in
    * BigInt so the rule stays exact at any recording length (frame
    * energies reach ~2^60 within minutes of 16-bit audio; the 64
    * BigInt multiplies per row are noise next to the decode). Bits
    * pack into four 16-bit bands — the same near-dup band-join unit as
    * the image hash and q30.
    *
    * The energy-vs-mean rule makes the fingerprint invariant under
    * re-encoding AND under uniform amplitude scaling (every energy
    * scales by α², both comparison sides alike) — a re-mastered or
    * volume-normalized copy of a recording lands on the identical
    * hash, which is exactly the duplicate class a byte hash misses.
    */
  def audioHash64(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.decodePcm16(c).map { case (_, pcm) =>
          val n = pcm.length
          val es = new Array[Long](64)
          val cs = new Array[Long](64)
          var i = 0
          while (i < n) {
            val j = (i.toLong * 64 / n).toInt
            es(j) += pcm(i).toLong * pcm(i)
            cs(j) += 1
            i += 1
          }
          var te = 0L
          var tc = 0L
          var j = 0
          while (j < 64) { te += es(j); tc += cs(j); j += 1 }
          val bands = new Array[Int](4)
          j = 0
          while (j < 64) {
            if (BigInt(es(j)) * tc > BigInt(te) * cs(j))
              bands(j / 16) |= 1 << (j % 16)
            j += 1
          }
          (id, bands(0), bands(1), bands(2), bands(3))
        }
      }).toDF("media_id", "band0", "band1", "band2", "band3")
  }

  /** Audio feature extraction: windowed RMS envelope over real decoded
    * PCM (samples normalized to [-1,1); window length in samples).
    * Undecodable payloads are dropped, like [[decodeImages]].
    */
  def audioFeatures(df: DataFrame, windowSize: Int = 256): Dataset[AudioFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.decodePcm16(c).map { case (_, pcm) =>
          val nSamples = pcm.length
          val nWin = math.max(1, nSamples / windowSize)
          val rms = new Array[Float](nWin)
          var w = 0
          while (w < nWin) {
            var acc = 0d
            var i = w * windowSize
            val end = math.min((w + 1) * windowSize, nSamples)
            while (i < end) {
              val s = pcm(i) / 32768d
              acc += s * s
              i += 1
            }
            rms(w) = math.sqrt(acc / math.max(1, end - w * windowSize)).toFloat
            w += 1
          }
          AudioFeatures(id, nWin, rms)
        }
      })
  }

  /** Frame-sample plan for video rows: one row per frame timestamp every
    * `everyMs` — pure metadata (sequence + explode), the binary column
    * is never read, so the scan prunes it entirely.
    *
    * ===================== STUB BOUNDARY (video only) ====================
    * Decoding each planned frame needs an H.264/VP9 bitstream decoder,
    * which the JDK does not ship; a real deployment hands the
    * (media_id, frame_ts_ms) plan to an external decode service or a
    * JNI/ffmpeg binding with the same mapPartitions batch shape as
    * [[decodeImages]].
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

  /** Container-metadata stage for video rows: (media_id, content) →
    * [[VideoMeta]] through the real ISO BMFF walker
    * ([[Codec.parseMp4Meta]]) — the video analog of q64's
    * payload-derived image dimensions. Unparseable containers are
    * POISONED (-1 markers), not dropped: a corrupt container is a
    * quality signal downstream gates read, and the -1 duration plans
    * zero frames by the [[frameSamplePlan]] guard.
    */
  def parseVideoMeta(df: DataFrame): Dataset[VideoMeta] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        Codec.parseMp4Meta(c) match {
          case Some((ts, dur, w, h)) if ts > 0 =>
            VideoMeta(id, ts, dur, dur * 1000L / ts, w, h)
          case _ => VideoMeta(id, -1, -1L, -1L, -1, -1)
        }
      })
  }

  /** [[frameSamplePlan]] with the duration derived from the CONTAINER
    * ITSELF — parse, then plan; no metadata column trusted. Poisoned
    * rows plan no frames. Only the per-frame pixel decode beyond this
    * point remains the external-decoder boundary.
    */
  def frameSamplePlanFromContent(df: DataFrame,
      everyMs: Long): DataFrame =
    frameSamplePlan(
      parseVideoMeta(df).toDF()
        .withColumn("media_type", lit("video/mp4"))
        .select("media_id", "media_type", "duration_ms"), everyMs)

  /** 64-bit video fingerprint WITHOUT bitstream decode —
    * [[audioHash64]]'s sign-band rule over the container's own
    * byte-rate signal: the stsz per-sample byte sizes
    * ([[Codec.parseMp4SampleSizes]] — a KB-scale box walk) split into
    * 64 frames along the sample axis (floor boundaries), each frame
    * accumulating its exact total byte size (Long), bit j set when
    * frame j's mean sample size exceeds the stream's mean — the
    * cross-multiplied integer comparison in BigInt (frame sums × count
    * products overrun a long on feature-length tracks). Bits pack into
    * four 16-bit bands, the shared near-dup band-join unit of the
    * image/audio hashes and q30.
    *
    * Why this catches what the byte hash misses: a RE-MUXED copy
    * (boxes reordered, metadata re-stamped, free padding added, faststart
    * re-packaging) rewrites the container but carries the bitstream —
    * and therefore the stsz table — verbatim, so it lands on the
    * identical hash; and a constant-quality RE-SCALE moves every
    * sample size roughly proportionally, which the mean comparison is
    * invariant to (both sides scale alike — the audio hash's amplitude
    * argument on the byte-rate axis). A genuinely different cut
    * (scene inserted/removed) shifts the size-energy layout and flips
    * profile bits. Rows with no parseable stsz drop, like
    * [[decodeImages]].
    */
  def videoHash64(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        Codec.parseMp4SampleSizes(c).filter(_.nonEmpty).map { sizes =>
          val b = sizeProfileBands(sizes)
          (id, b(0), b(1), b(2), b(3))
        }
      }).toDF("media_id", "band0", "band1", "band2", "band3")
  }

  /** The 64-frame size-profile sign bands of a sample-size stream —
    * ONE definition for [[videoHash64]] and [[videoProfile]].
    */
  private def sizeProfileBands(sizes: Array[Long]): Array[Int] = {
    val n = sizes.length
    val es = new Array[Long](64)
    val cs = new Array[Long](64)
    var i = 0
    while (i < n) {
      val j = (i.toLong * 64 / n).toInt
      es(j) += sizes(i)
      cs(j) += 1
      i += 1
    }
    var te = 0L
    var tc = 0L
    var j = 0
    while (j < 64) { te += es(j); tc += cs(j); j += 1 }
    val bands = new Array[Int](4)
    j = 0
    while (j < 64) {
      if (BigInt(es(j)) * tc > BigInt(te) * cs(j))
        bands(j / 16) |= 1 << (j % 16)
      j += 1
    }
    bands
  }

  /** One-pass video PROFILE — [[videoHash64]]'s bands AND the q132
    * metadata facts (timescale, exact duration_ms, track dims) from a
    * single row pass over the payload (two KB-scale box walks of the
    * same byte array; no bitstream is ever touched), the video kernel
    * of the staged curation feed. Rows whose container parses neither
    * a movie header nor a sample table drop — the corrupt-upload
    * class the gate would reject anyway.
    */
  def videoProfile(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        for {
          (ts, dur, w, h) <- Codec.parseMp4Meta(c) if ts > 0
          sizes <- Codec.parseMp4SampleSizes(c) if sizes.nonEmpty
        } yield {
          val b = sizeProfileBands(sizes)
          (id, b(0), b(1), b(2), b(3), ts, dur * 1000L / ts, w, h)
        }
      }).toDF("media_id", "band0", "band1", "band2", "band3",
        "timescale", "duration_ms", "width", "height")
  }
}
