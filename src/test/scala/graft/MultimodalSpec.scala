package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.DecodedImage

/** Multimodal binary-column plumbing: schema/partitioning/batch shape
  * plus REAL image/audio decode through the JDK's own codecs
  * (javax.imageio, javax.sound.sampled); only video bitstream decode
  * remains an external-decoder boundary.
  */
class MultimodalSpec extends SparkSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def mediaRow(id: Long, mt: String, content: Array[Byte],
      w: Int = 0, h: Int = 0, rate: Int = 0, durMs: Long = 0L): Row =
    Row(id, mt, "fake", w, h, rate, durMs, content)

  private def mediaDf(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq),
      Multimodal.mediaSchema)

  test("CrossModal: alignment is the exact cosine, the gate keeps " +
    "pairs at/above tau, and undefined pairs (missing modality, " +
    "dimension mismatch) drop as misaligned") {
    import spark.implicits._
    val C = graft.multimodal.CrossModal
    val pairs = Seq(
      (1L, Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)),   // cosine 1
      (2L, Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),   // cosine 0
      (3L, Seq(3.0, 4.0, 0.0), Seq(3.0, 4.0, 0.0)),   // cosine 1, unnormalized
      (4L, Seq(1.0, 1.0, 0.0), Seq(1.0, 0.0, 0.0)))   // cosine 1/sqrt(2)
      .toDF("pair_id", "cv", "iv")
      .withColumn("cv", col("cv").cast("array<double>"))
      .withColumn("iv", col("iv").cast("array<double>"))
    val scored = C.scored(pairs, "cv", "iv")
      .select("pair_id", "alignment").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) === 1.0 && scored(3L) === 1.0)
    assert(scored(2L) === 0.0)
    assert(scored(4L) === 1.0 / math.sqrt(2.0))
    def kept(df: org.apache.spark.sql.DataFrame, tau: Double): Seq[Long] =
      C.keepAligned(df, "cv", "iv", tau)
        .select("pair_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept(pairs, 0.25) === Seq(1L, 3L, 4L))
    assert(kept(pairs, 0.8) === Seq(1L, 3L))
    // undefined scores never clear the gate: null vector, mismatched
    // dimensions
    val broken = Seq(
      (10L, Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))), // fine
      (11L, None, Some(Seq(1.0, 0.0))),                // missing caption
      (12L, Some(Seq(1.0, 0.0, 0.0)), Some(Seq(1.0, 0.0))), // dim drift
      (13L, Some(Seq(0.0, 0.0)), Some(Seq(1.0, 0.0)))) // zero norm: NaN
      .toDF("pair_id", "cv", "iv")
      .withColumn("cv", col("cv").cast("array<double>"))
      .withColumn("iv", col("iv").cast("array<double>"))
    // 13 is the dangerous one: Spark orders NaN ABOVE every number,
    // so without the explicit isnan guard a dead-encoder zero-norm
    // pair would pass any threshold
    assert(kept(broken, 0.0) === Seq(10L),
      "an unscorable pair must drop as misaligned")
    assert(C.scored(broken, "cv", "iv")
      .filter(col("pair_id").isin(11L, 12L))
      .select("alignment").collect().forall(_.isNullAt(0)))
    assert(C.scored(broken, "cv", "iv")
      .filter(col("pair_id") === 13L)
      .select("alignment").collect()(0).getDouble(0).isNaN)
  }

  test("magic-byte sniffing: png/jpeg/wav/mp4/unknown") {
    val png = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3, 4)
    val jpg = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0, 1, 2, 3, 4, 5, 6, 7)
    val wav = "RIFF".getBytes ++ bytes(1, 2, 3, 4) ++ "WAVE".getBytes
    val mp4 = bytes(0, 0, 0, 0x18) ++ "ftypisom".getBytes
    val other = bytes(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val df = mediaDf(
      mediaRow(1, "image/png", png), mediaRow(2, "image/jpeg", jpg),
      mediaRow(3, "audio/wav", wav), mediaRow(4, "video/mp4", mp4),
      mediaRow(5, "unknown", other))
    val got = Multimodal.withSniffedType(df)
      .select("media_id", "sniffed_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "audio/wav", 4L -> "video/mp4",
      5L -> "application/octet-stream"))
  }

  test("size-aware repartition: partition count = ceil(bytes/target)") {
    val rows = (1L to 10L).map(i => mediaRow(i, "image/png",
      Array.fill[Byte](1000)(i.toByte)))
    val df = mediaDf(rows: _*)
    assert(Multimodal.repartitionForDecode(df, 2500L)
      .rdd.getNumPartitions === 4) // 10000 bytes / 2500
    assert(Multimodal.repartitionForDecode(df, 1000000L)
      .rdd.getNumPartitions === 1)
  }

  test("real PNG decode: lossless pixel round trip through javax.imageio") {
    // encode a known 2x2 grayscale raster, decode it back through the
    // distributed decode stage — values and payload-derived dims exact
    val px = Seq(0, 51, 102, 153) // row-major
    val content = Multimodal.Codec.encodePng(2, 2, (x, y) => px(y * 2 + x))
    assert(content.take(4).toSeq ===
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) // real PNG
    val df = mediaDf(mediaRow(7, "image/png", content))
    val out = Multimodal.decodeImages(df).collect()
    assert(out.length === 1)
    val img = out.head
    assert(img.media_id === 7 && img.width === 2 && img.height === 2)
    assert(img.pixels.toSeq === px.map(_ / 255f))
  }

  test("real JPEG decode: dims exact, values within lossy tolerance") {
    val buf = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      buf.getRaster.setSample(x, y, 0, 128)
    val os = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "jpg", os)
    val df = mediaDf(mediaRow(8, "image/jpeg", os.toByteArray))
    val out = Multimodal.decodeImages(df).collect().head
    assert(out.width === 4 && out.height === 4)
    // flat 128 plane survives JPEG within a couple of quantization steps
    assert(out.pixels.forall(p => math.abs(p - 128 / 255f) < 0.05f))
  }

  test("undecodable payloads are dropped, not thrown") {
    val good = Multimodal.Codec.encodePng(2, 2, (_, _) => 7)
    val df = mediaDf(
      mediaRow(1, "image/png", good),
      mediaRow(2, "image/png", bytes(1, 2, 3, 4, 5)), // garbage
      mediaRow(3, "image/png", Array.empty[Byte]))
    val out = Multimodal.decodeImages(df).collect()
    assert(out.map(_.media_id).toSeq === Seq(1L))
  }

  test("resize: 4x4 -> 2x2 average pooling is exact") {
    import spark.implicits._
    val pixels = (0 until 16).map(_.toFloat).toArray // row-major 4x4
    val ds = Seq(DecodedImage(1L, 4, 4, pixels)).toDS()
    val out = Multimodal.resizeImages(ds, 2, 2).collect().head
    // boxes: (0,1,4,5) (2,3,6,7) (8,9,12,13) (10,11,14,15)
    assert(out.pixels.toSeq === Seq(2.5f, 4.5f, 10.5f, 12.5f))
    assert(out.width === 2 && out.height === 2)
  }

  test("real WAV decode: PCM16 round trip through javax.sound.sampled") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 12345)
    val wav = Multimodal.Codec.encodeWavPcm16(samples, 8000)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    val got = Multimodal.Codec.decodePcm16(wav)
    assert(got.isDefined)
    val (rate, decoded) = got.get
    assert(rate === 8000)
    assert(decoded.toSeq === samples.toSeq)
    assert(Multimodal.Codec.decodePcm16(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audio features: windowed RMS over real decoded PCM") {
    // constant sample 16384 = 0.5 full-scale -> RMS 0.5 per window
    val content = Multimodal.Codec.encodeWavPcm16(
      Array.fill(512)(16384), 8000) // 512 samples -> 2 windows of 256
    val df = mediaDf(mediaRow(9, "audio/wav", content,
      rate = 8000, durMs = 64L))
    val out = Multimodal.audioFeatures(df, windowSize = 256).collect().head
    assert(out.media_id === 9 && out.n_windows === 2)
    assert(out.rms.toSeq.forall(v => math.abs(v - 0.5f) < 1e-6))
  }

  test("aHash64: re-encoded and block-upscaled duplicates land on the " +
    "identical hash; a small brightness shift is Hamming-1; a distinct " +
    "image is far") {
    import spark.implicits._
    import Multimodal.{Codec => C}
    // base: 16x16, each 2x2 aHash box uniform at 8*bx + 4*by (0..84,
    // global mean 42 — no box value equals the mean, so every bit is
    // decided, and values are multiples of 4, so the +48 perturbation
    // below shifts the mean by 0.75 without crossing any box value)
    def base(x: Int, y: Int): Int = (x / 2) * 8 + (y / 2) * 4
    val png1 = C.encodePng(16, 16, base)
    val png1b = C.encodePng(16, 16, base) // independent re-encode
    // 2x block upscale: 32x32 pooling back to the same box means
    val png2 = C.encodePng(32, 32, (x, y) => base(x / 2, y / 2))
    // top-left aHash box brightened 0 -> 48 (> shifted mean 42.75):
    // exactly bit 0 flips
    val png3 = C.encodePng(16, 16,
      (x, y) => if (x < 2 && y < 2) 48 else base(x, y))
    // inverted gradient: every box lands on the other side of the mean
    val png4 = C.encodePng(16, 16, (x, y) => base(15 - x, 15 - y))
    val df = Seq(1L -> png1, 2L -> png1b, 3L -> png2, 4L -> png3,
      5L -> png4).toDF("media_id", "content")
    val hs = Multimodal.aHash64(Multimodal.decodeImages(df))
      .collect().map(r => r.getLong(0) ->
        Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def hamming(a: Array[Int], b: Array[Int]): Int =
      (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum
    assert(hs(1L).toSeq === hs(2L).toSeq, "re-encode must be exact-dup")
    assert(hs(1L).toSeq === hs(3L).toSeq, "block upscale must be exact-dup")
    assert(hamming(hs(1L), hs(4L)) === 1, "one brightened box = Hamming 1")
    assert(hamming(hs(1L), hs(5L)) === 64, "inverted image = complement")
  }

  test("audioHash64: re-encoded and amplitude-scaled duplicates land " +
    "on the identical fingerprint; a single boosted frame is " +
    "Hamming-1; a distinct recording is far") {
    import spark.implicits._
    import Multimodal.{Codec => C}
    // 640 samples = 64 uniform 10-sample frames at TWO energy levels
    // (quiet first half, loud second): per-sample energies 1e4 vs 1e6,
    // so the global mean sits far from every frame and single-frame
    // edits move exactly their own bit
    def base(i: Int): Int = if (i / 10 < 32) 100 else 1000
    val n = 640
    val wav1 = C.encodeWavPcm16(Array.tabulate(n)(base), 8000)
    val wav1b = C.encodeWavPcm16(Array.tabulate(n)(base), 8000)
    // uniform 2x amplitude: every frame energy scales by 4 — the
    // mean-comparison bits cannot move (loudness invariance)
    val wav2 = C.encodeWavPcm16(Array.tabulate(n)(i => base(i) * 2), 8000)
    // quiet frame 7 boosted to the loud level: exactly its bit flips
    // (the mean moves by ~1.5% of the level gap — far from any frame)
    val wav3 = C.encodeWavPcm16(Array.tabulate(n)(i =>
      if (i / 10 == 7) 1000 else base(i)), 8000)
    // swapped halves: every frame lands on the other side of the mean
    val wav4 = C.encodeWavPcm16(Array.tabulate(n)(i =>
      base(n - 1 - i)), 8000)
    val df = Seq(1L -> wav1, 2L -> wav1b, 3L -> wav2, 4L -> wav3,
      5L -> wav4).toDF("media_id", "content")
    val hs = Multimodal.audioHash64(df)
      .collect().map(r => r.getLong(0) ->
        Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def hamming(a: Array[Int], b: Array[Int]): Int =
      (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum
    assert(hs(1L).toSeq === hs(2L).toSeq, "re-encode must be exact-dup")
    assert(hs(1L).toSeq === hs(3L).toSeq,
      "uniform amplitude scaling must not move any energy-mean bit")
    assert(hamming(hs(1L), hs(4L)) === 1,
      "boosting exactly one quiet frame must flip exactly its bit")
    assert(hamming(hs(1L), hs(5L)) === 64,
      "swapped halves must complement every energy-mean bit")
  }

  test("quality metrics: exact integer facts through the real codecs") {
    import spark.implicits._
    import Multimodal.{Codec => C}
    // image: 4x4 plane with values 0..15 — every fact is closed-form
    val png = C.encodePng(4, 4, (x, y) => y * 4 + x)
    val im = Multimodal.imageQualityMetrics(Multimodal.decodeImages(
        Seq(1L -> png).toDF("media_id", "content")))
      .collect().head
    assert((im.getLong(0), im.getInt(1), im.getInt(2), im.getLong(3),
      im.getLong(4)) === ((1L, 4, 4, 120L, 16L)))
    // audio: two rail samples among four — clipping and energy exact
    val wav = C.encodeWavPcm16(Array(0, 32767, -32768, 100), 8000)
    val au = Multimodal.audioQualityMetrics(
        Seq(2L -> wav).toDF("media_id", "content"))
      .collect().head
    assert((au.getLong(0), au.getInt(1), au.getLong(2), au.getLong(3),
      au.getLong(4)) === ((2L, 8000, 4L, 2L,
        32767L * 32767 + 32768L * 32768 + 100L * 100)))
  }

  test("one-pass profiles equal the single-purpose kernels (hash " +
    "bands AND quality facts — the staged feed cannot drift from the " +
    "operators it fuses)") {
    import spark.implicits._
    import Multimodal.{Codec => C}
    val media = Seq(
      1L -> C.encodePng(16, 16, (x, y) => (x * 7 + y * 13) % 256),
      2L -> C.encodePng(4, 12, (x, y) => 64 + x * 16 + y))
      .toDF("media_id", "content")
    val dec = Multimodal.decodeImages(media)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val prof = m(Multimodal.imageProfile(dec))
    val hash = m(Multimodal.aHash64(dec))
    val qual = m(Multimodal.imageQualityMetrics(dec))
    prof.foreach { case (id, row) =>
      assert(row === hash(id) ++ qual(id), s"image profile drift @$id")
    }
    val audio = Seq(
      3L -> C.encodeWavPcm16(
        Array.tabulate(640)(i => (i * 37) % 4096 - 2048), 8000),
      4L -> C.encodeWavPcm16(
        Array.tabulate(320)(i => if (i % 5 == 0) 32767 else i), 16000))
      .toDF("media_id", "content")
    val aProf = m(Multimodal.audioProfile(audio))
    val aHash = m(Multimodal.audioHash64(audio))
    val aQual = m(Multimodal.audioQualityMetrics(audio))
    aProf.foreach { case (id, row) =>
      assert(row === aHash(id) ++ aQual(id), s"audio profile drift @$id")
    }
  }

  test("frame-sample plan: one row per everyMs tick, metadata only") {
    val df = mediaDf(
      mediaRow(1, "video/mp4", bytes(1), durMs = 1000L),
      mediaRow(2, "image/png", bytes(1), durMs = 999L)) // not video: dropped
    val got = Multimodal.frameSamplePlan(df, 250L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq.sorted ===
      Seq((1L, 0L), (1L, 250L), (1L, 500L), (1L, 750L)))
  }

  // hand-built ISO BMFF boxes: the writer only emits version-0 boxes,
  // so the v1 / largesize / reordering laws need independent bytes
  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def mkBox(t: String, content: Array[Byte]): Array[Byte] =
    be32(8L + content.length) ++ t.getBytes("US-ASCII") ++ content

  test("parseMp4Meta: real box walking — unknown boxes skipped by " +
    "size, child order immaterial, version-1 and largesize boxes " +
    "readable, malformed sizes poison instead of throwing") {
    import graft.multimodal.Multimodal.{Codec => C}
    // the writer's own output round-trips, and sniffs as video/mp4
    val std = C.encodeMp4Meta(800, 4000L, 320, 240)
    assert(C.parseMp4Meta(std) === Some((800, 4000L, 320, 240)))
    assert(new String(std, 4, 4, "US-ASCII") === "ftyp")
    // reordered: trak BEFORE mvhd, extra unknown 'skip' children —
    // the walker must not assume the writer's layout
    val mvhd0 = mkBox("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1800) ++
        Array.fill(80)(0.toByte))
    val tkhd0 = mkBox("tkhd",
      be32(0) ++ Array.fill(72)(0.toByte) ++
        be32(128L << 16) ++ be32(96L << 16))
    val skip = mkBox("skip", Array.fill(9)(0x77.toByte))
    val reordered = mkBox("moov",
      skip ++ mkBox("trak", skip ++ tkhd0) ++ mvhd0)
    assert(C.parseMp4Meta(reordered) === Some((600, 1800L, 128, 96)))
    // version-1 mvhd/tkhd (64-bit times) — the modern-muxer form
    val mvhd1 = mkBox("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1000) ++
        be64(90000L) ++ Array.fill(80)(0.toByte))
    val tkhd1 = mkBox("tkhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill(84)(0.toByte) ++
        be32(640L << 16) ++ be32(480L << 16))
    val v1 = mkBox("moov", mvhd1 ++ mkBox("trak", tkhd1))
    assert(C.parseMp4Meta(v1) === Some((1000, 90000L, 640, 480)))
    // largesize (size field 1, real 64-bit size follows) on moov
    val inner = mvhd0 ++ mkBox("trak", tkhd0)
    val large = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + inner.length) ++ inner
    assert(C.parseMp4Meta(large) === Some((600, 1800L, 128, 96)))
    // a zero-dim track falls back, a dimensioned one wins regardless
    // of order
    val zeroTrak = mkBox("trak", mkBox("tkhd",
      be32(0) ++ Array.fill(72)(0.toByte) ++ be32(0) ++ be32(0)))
    val twoTraks = mkBox("moov",
      mvhd0 ++ zeroTrak ++ mkBox("trak", tkhd0))
    assert(C.parseMp4Meta(twoTraks) === Some((600, 1800L, 128, 96)))
    // malformed: a child whose declared size overruns its container
    val lying = mkBox("moov", be32(1000000L) ++ "mvhd".getBytes("US-ASCII"))
    assert(C.parseMp4Meta(lying) === None)
    assert(C.parseMp4Meta(Array[Byte](1, 2, 3)) === None)
    assert(C.parseMp4Meta("not a container at all".getBytes) === None)
  }

  test("parseVideoMeta + frameSamplePlanFromContent: duration derives " +
    "from the container bytes, poisoned rows plan no frames") {
    import spark.implicits._
    import graft.multimodal.Multimodal.{Codec => C}
    val df = Seq(
      (1L, C.encodeMp4Meta(1000, 1000L, 320, 240)), // 1000 ms
      (2L, C.encodeMp4Meta(600, 300L, 160, 120)),   // 500 ms
      (3L, "garbage".getBytes)) // poisoned
      .toDF("media_id", "content")
    val meta = Multimodal.parseVideoMeta(df).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).duration_ms === 1000L)
    assert((meta(2L).timescale, meta(2L).duration_ms,
      meta(2L).width, meta(2L).height) === ((600, 500L, 160, 120)))
    assert(meta(3L).duration_ms === -1L)
    val plan = Multimodal.frameSamplePlanFromContent(df, 250L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    assert(plan === Seq((1L, 0L), (1L, 250L), (1L, 500L), (1L, 750L),
      (2L, 0L), (2L, 250L)))
  }

  test("parseMp4SampleSizes: per-sample and uniform stsz forms parse, " +
    "a re-mux keeps the table verbatim, malformed tables are None") {
    import graft.multimodal.Multimodal.{Codec => C}
    val sizes = Array.tabulate(37)(i => 100 + i * 7)
    val std = C.encodeMp4WithSamples(800, 4000L, 320, 240, sizes)
    assert(C.parseMp4SampleSizes(std).map(_.toSeq)
      === Some(sizes.map(_.toLong).toSeq))
    // the metadata walk still reads the same container (one writer)
    assert(C.parseMp4Meta(std) === Some((800, 4000L, 320, 240)))
    // re-mux: extra free padding + moov children reordered — bytes
    // differ, the sample table must not
    val remux = C.encodeMp4WithSamples(800, 4000L, 320, 240, sizes,
      remuxPadding = 24)
    assert(!java.util.Arrays.equals(std, remux))
    assert(C.parseMp4SampleSizes(remux).map(_.toSeq)
      === Some(sizes.map(_.toLong).toSeq))
    // uniform-size stsz (sample_size != 0, no table) — hand-built
    // container, the form faststart muxers write for CBR streams
    def box(t: String, c: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + c.length)
      b.putInt(8 + c.length).put(t.getBytes("US-ASCII")).put(c)
      b.array()
    }
    val uniStsz = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0).putInt(512).putInt(9) // 9 samples of 512 bytes
      box("stsz", b.array())
    }
    val uni = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", uniStsz)))))
    assert(C.parseMp4SampleSizes(uni).map(_.toSeq)
      === Some(Seq.fill(9)(512L)))
    // no sample table at all (the metadata-only skeleton) -> None
    assert(C.parseMp4SampleSizes(
      C.encodeMp4Meta(800, 4000L, 320, 240)) === None)
    // a table that overruns its box -> None, not a throw
    val lyingStsz = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(0).putInt(0).putInt(999).putInt(100) // claims 999 entries
      box("stsz", b.array())
    }
    val lying = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", lyingStsz)))))
    assert(C.parseMp4SampleSizes(lying) === None)
    assert(C.parseMp4SampleSizes("garbage".getBytes) === None)
  }

  test("videoHash64: re-muxed and proportionally-rescaled duplicates " +
    "land on the identical fingerprint; a single-frame edit is " +
    "Hamming-1; a reversed cut is far") {
    import spark.implicits._
    import Multimodal.{Codec => C}
    // 640 samples = 64 uniform 10-sample frames at TWO byte-rate
    // levels (small first half, big second): frame means 100 vs 1000,
    // the global mean far from every frame, so single-frame edits
    // move exactly their own bit (the audioHash64 spec's geometry on
    // the size axis)
    def base(i: Int): Int = if (i / 10 < 32) 100 else 1000
    val n = 640
    def clip(sz: Int => Int, pad: Int = 0): Array[Byte] =
      C.encodeMp4WithSamples(600, n * 400L, 640, 360,
        Array.tabulate(n)(sz), remuxPadding = pad)
    val v1 = clip(base)
    val v1remux = clip(base, pad = 20) // byte-different, same stsz
    assert(!java.util.Arrays.equals(v1, v1remux))
    // constant-quality transcode: every sample size scales alike —
    // the mean-comparison bits cannot move
    val v2 = clip(i => base(i) * 3)
    // small frame 7 boosted to the big level: exactly its bit flips
    val v3 = clip(i => if (i / 10 == 7) 1000 else base(i))
    // reversed cut: every frame lands on the other side of the mean
    val v4 = clip(i => base(n - 1 - i))
    val df = Seq(1L -> v1, 2L -> v1remux, 3L -> v2, 4L -> v3,
      5L -> v4).toDF("media_id", "content")
    val hs = Multimodal.videoHash64(df)
      .collect().map(r => r.getLong(0) ->
        Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def hamming(a: Array[Int], b: Array[Int]): Int =
      (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum
    assert(hs(1L).toSeq === hs(2L).toSeq,
      "a re-muxed container must be an exact fingerprint dup")
    assert(hs(1L).toSeq === hs(3L).toSeq,
      "proportional size scaling must not move any profile bit")
    assert(hamming(hs(1L), hs(4L)) === 1,
      "boosting exactly one frame must flip exactly its bit")
    assert(hamming(hs(1L), hs(5L)) === 64,
      "a reversed cut must complement every profile bit")
    // rows with no parseable sample table drop, like decodeImages
    val mixed = Seq(6L -> v1, 7L -> "not a container".getBytes,
      8L -> C.encodeMp4Meta(600, 1800L, 128, 96)).toDF(
      "media_id", "content")
    assert(Multimodal.videoHash64(mixed).collect().map(_.getLong(0))
      .toSeq === Seq(6L))
  }

  test("videoProfile equals the single-purpose kernels (hash bands " +
    "and q132 metadata facts from one pass)") {
    import spark.implicits._
    import Multimodal.{Codec => C}
    val df = Seq(
      (1L, C.encodeMp4WithSamples(1000, 2500L, 320, 240,
        Array.tabulate(128)(i => 50 + (i % 9) * 100))),
      (2L, C.encodeMp4WithSamples(600, 1800L, 1280, 720,
        Array.fill(64)(777), remuxPadding = 8)),
      (3L, "poison".getBytes)).toDF("media_id", "content")
    val prof = Multimodal.videoProfile(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(prof.keySet === Set(1L, 2L), "poisoned rows must drop")
    val hs = Multimodal.videoHash64(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toMap
    for (id <- Seq(1L, 2L))
      assert((prof(id).getInt(1), prof(id).getInt(2),
        prof(id).getInt(3), prof(id).getInt(4)) === hs(id))
    assert((prof(1L).getInt(5), prof(1L).getLong(6), prof(1L).getInt(7),
      prof(1L).getInt(8)) === ((1000, 2500L, 320, 240)))
    assert((prof(2L).getInt(5), prof(2L).getLong(6), prof(2L).getInt(7),
      prof(2L).getInt(8)) === ((600, 3000L, 1280, 720)))
  }
}
