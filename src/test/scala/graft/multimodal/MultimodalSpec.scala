package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def payloads = Seq(
    (1L, "tiny".getBytes("UTF-8")),
    (2L, ("x" * 1000).getBytes("UTF-8")),
    (3L, Array.empty[Byte])
  ).toDF("id", "payload")

  test("media struct carries payload plus typed metadata (X5)") {
    val df = payloads.select(Multimodal.media(col("payload"), lit("img")).as("m"))
    val schema = df.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("payload", "meta"))
    val meta = df.select("m.meta.format", "m.meta.n_bytes").as[(String, Long)].collect()
    assert(meta.toSet == Set(("img", 4L), ("img", 1000L), ("img", 0L)))
  }

  test("decodePartitions applies the stub decoder partition-wise") {
    val out = Multimodal.decodePartitions(payloads, "id", "payload")
      .as[(Long, Int, Int)].collect().toSet
    val expected = Seq(
      (1L, "tiny".getBytes("UTF-8")),
      (2L, ("x" * 1000).getBytes("UTF-8")),
      (3L, Array.empty[Byte])
    ).map { case (id, b) => val (w, h) = Multimodal.stubDecode(b); (id, w, h) }.toSet
    assert(out == expected)
  }

  test("resizeMeta scales into the box preserving aspect ratio") {
    val df = Seq((1920, 1080), (320, 240), (100, 900)).toDF("w", "h")
      .select(Multimodal.resizeMeta(col("w"), col("h"), 640, 480).as("m"))
      .select("m.width", "m.height").as[(Int, Int)].collect().toSeq
    assert(df == Seq((640, 360), (320, 240), (53, 480)))
  }

  test("sampleFrames yields n windows of the requested size") {
    val frames = payloads.filter(col("id") === 2)
      .select(Multimodal.sampleFrames(col("payload"), 4, 10).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.size == 4)
    assert(frames.forall(_.length == 10))
  }

  private def encode(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("imageDims reads real PNG/JPEG headers; garbage falls back to the stub") {
    assert(Multimodal.imageDims(encode("png", 37, 21)).contains((37, 21)))
    assert(Multimodal.imageDims(encode("jpg", 64, 48)).contains((64, 48)))
    val junk = Array.fill[Byte](100)(0x5a)
    assert(Multimodal.imageDims(junk).isEmpty)
    assert(Multimodal.imageDecode(junk) == Multimodal.stubDecode(junk))
  }

  test("decodePartitions with the real image decoder yields true dimensions") {
    val media = Seq(
      (1L, encode("png", 37, 21)),
      (2L, encode("jpg", 64, 48)),
      (3L, null: Array[Byte])
    ).toDF("id", "payload")
    val out = Multimodal.decodePartitions(media, "id", "payload", Multimodal.imageDecode)
      .orderBy("id")
      .as[(Long, Option[Int], Option[Int])].collect().toSeq
    assert(out == Seq(
      (1L, Some(37), Some(21)),
      (2L, Some(64), Some(48)),
      (3L, None, None)))
  }

  /** Encode `nFrames` of silence as a real audio container via the JDK. */
  private def encodeAudio(tpe: javax.sound.sampled.AudioFileFormat.Type,
      sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  test("audioMeta reads real WAV/AIFF headers; garbage yields None") {
    import javax.sound.sampled.AudioFileFormat.Type
    val wav = Multimodal.audioMeta(encodeAudio(Type.WAVE, 8000f, 1, 800)).get
    assert(wav.sampleRate == 8000.0 && wav.channels == 1 &&
      wav.bitsPerSample == 16 && wav.nFrames == 800L)
    assert(wav.durationSec.exists(d => math.abs(d - 0.1) < 1e-9))

    val aiff = Multimodal.audioMeta(encodeAudio(Type.AIFF, 44100f, 2, 4410)).get
    assert(aiff.sampleRate == 44100.0 && aiff.channels == 2)
    assert(aiff.durationSec.exists(d => math.abs(d - 0.1) < 1e-9))

    assert(Multimodal.audioMeta(Array.fill[Byte](64)(0x5a)).isEmpty)
  }

  test("frameCount counts real animated-GIF frames; 1 for stills; None for junk") {
    // assemble a 3-frame animated GIF with the JDK's sequence writer
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { _ =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    assert(Multimodal.frameCount(out.toByteArray).contains(3))
    assert(Multimodal.frameCount(encode("png", 4, 4)).contains(1))
    assert(Multimodal.frameCount(Array.fill[Byte](32)(0x11)).isEmpty)
  }

  test("audioDecodePartitions emits per-clip metadata rows; nulls survive") {
    import javax.sound.sampled.AudioFileFormat.Type
    val media = Seq(
      (1L, encodeAudio(Type.WAVE, 16000f, 2, 3200)),
      (2L, null: Array[Byte]),
      (3L, Array.fill[Byte](32)(0x00)) // unrecognized -> null metadata
    ).toDF("id", "payload")
    val rows = Multimodal.audioDecodePartitions(media, "id", "payload")
      .orderBy("id").collect()
    assert(rows(0).getDouble(2) == 16000.0 && rows(0).getInt(3) == 2 &&
      rows(0).getLong(5) == 3200L && math.abs(rows(0).getDouble(6) - 0.2) < 1e-9)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(6))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(6))
  }

  test("syntheticBmp round-trips through the real header decode") {
    assert(Multimodal.imageDims(Multimodal.syntheticBmp(37, 23)).contains((37, 23)))
    assert(Multimodal.imageDims(Multimodal.syntheticBmp(1, 1)).contains((1, 1)))
    assert(Multimodal.imageDims(Multimodal.syntheticBmp(640, 480)).contains((640, 480)))
    intercept[IllegalArgumentException](Multimodal.syntheticBmp(0, 4))
  }

  test("syntheticGif round-trips through the real frame-count decode") {
    assert(Multimodal.frameCount(Multimodal.syntheticGif(1)).contains(1))
    assert(Multimodal.frameCount(Multimodal.syntheticGif(7)).contains(7))
    intercept[IllegalArgumentException](Multimodal.syntheticGif(0))
    val rows = Multimodal.frameCountPartitions(
        Seq((1L, Multimodal.syntheticGif(3)), (2L, null: Array[Byte]),
          (3L, Array.fill[Byte](16)(0x2A))).toDF("id", "payload"),
        "id", "payload")
      .orderBy("id").collect()
    assert(rows(0).getInt(1) == 3 && rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("syntheticWav round-trips through the real audio header decode") {
    val m = Multimodal.audioMeta(Multimodal.syntheticWav(16000, 2, 16, 3200)).get
    assert(m.encoding == "PCM_SIGNED" && m.sampleRate == 16000.0 &&
      m.channels == 2 && m.bitsPerSample == 16 && m.nFrames == 3200L &&
      m.durationSec.exists(d => math.abs(d - 0.2) < 1e-9))
    // zero-frame clip: valid container, zero duration
    val z = Multimodal.audioMeta(Multimodal.syntheticWav(8000, 1, 16, 0)).get
    assert(z.nFrames == 0L && z.durationSec.contains(0.0))
    intercept[IllegalArgumentException](Multimodal.syntheticWav(8000, 1, 12, 10))
  }

  test("syntheticBmpGradient decodes to the formula's pixels, top-left origin") {
    // width 9: rows pad to 4 bytes (27 → 28), the off-by-padding trap
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.syntheticBmpGradient(9, 5, 40)))
    assert(img.getWidth == 9 && img.getHeight == 5)
    for (x <- 0 until 9; y <- 0 until 5) {
      val v = (40 + 7 * x + 13 * y) % 256
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == v && ((rgb >> 8) & 0xFF) == v &&
        (rgb & 0xFF) == v, s"pixel ($x,$y)")
    }
  }

  test("imageAHash: real pixel decode reproduces the sampling arithmetic") {
    // 8×8 + seed 0: samples are lum(i,j) = 7i+13j (no mod wrap), an
    // independent replay of the decode+sample+threshold pipeline
    val lum = for (j <- 0 until 8; i <- 0 until 8) yield 7 * i + 13 * j
    val mean = lum.map(_.toLong).sum / 64
    val expected = lum.zipWithIndex
      .collect { case (l, k) if l > mean => 1L << k }
      .foldLeft(0L)(_ | _)
    val got = Multimodal.imageAHash(Multimodal.syntheticBmpGradient(8, 8, 0))
    assert(got.contains(expected))
    // determinism + param sensitivity
    assert(Multimodal.imageAHash(Multimodal.syntheticBmpGradient(11, 9, 85))
      == Multimodal.imageAHash(Multimodal.syntheticBmpGradient(11, 9, 85)))
    // 1×1 image: the whole grid samples one pixel, lum == mean, hash 0
    assert(Multimodal.imageAHash(Multimodal.syntheticBmpGradient(1, 1, 99))
      .contains(0L))
    // corrupt payload → None, never a throw
    assert(Multimodal.imageAHash(Array.fill[Byte](24)(0x11)).isEmpty)
  }

  test("imageResizeNearest: real decode + integer resample + re-encode round-trips") {
    // 11×9 gradient → 8×6: every output pixel must equal the source pixel
    // at (x·11/8, y·9/6) — and the output must itself be a decodable BMP
    val out = Multimodal.imageResizeNearest(
      Multimodal.syntheticBmpGradient(11, 9, 30), 8, 6).get
    assert(Multimodal.imageDims(out).contains((8, 6)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    for (x <- 0 until 8; y <- 0 until 6) {
      val v = (30 + 7 * (x * 11 / 8) + 13 * (y * 9 / 6)) % 256
      assert((img.getRGB(x, y) & 0xFF) == v, s"pixel ($x,$y)")
    }
    // upscale path: 2×2 → 5×3 replicates source pixels, still decodable
    val up = Multimodal.imageResizeNearest(
      Multimodal.syntheticBmpGradient(2, 2, 0), 5, 3).get
    assert(Multimodal.imageDims(up).contains((5, 3)))
    // corrupt payload → None; bad target box throws
    assert(Multimodal.imageResizeNearest(Array.fill[Byte](16)(0x22), 4, 4).isEmpty)
    intercept[IllegalArgumentException](
      Multimodal.imageResizeNearest(Multimodal.syntheticBmp(2, 2), 0, 4))
  }

  test("encodeBmp is format-faithful: PNG and BMP of the same pixels hash equal") {
    // imageAHash must be a function of PIXELS, not container format: write
    // the same gradient through the JDK's PNG encoder and through encodeBmp
    def rgb(x: Int, y: Int): Int = { val v = (7 * x + 13 * y) % 256; v << 16 | v << 8 | v }
    val bmp = Multimodal.encodeBmp(9, 8, rgb)
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 9; y <- 0 until 8) img.setRGB(x, y, rgb(x, y))
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    assert(Multimodal.imageAHash(bmp).isDefined)
    assert(Multimodal.imageAHash(bmp) == Multimodal.imageAHash(png.toByteArray))
  }

  test("audioEnergy: real sample decode reproduces the pattern arithmetic") {
    // 3 frames × 2 channels, seed 40000: samples (40000+3k)%65536-32768 —
    // seed chosen past 2^15 so NEGATIVE samples exercise sign handling
    val expected = (0 until 6).map { k =>
      val s = ((40000 + 3 * k) % 65536) - 32768
      s.toLong * s
    }.sum
    val got = Multimodal.audioEnergy(
      Multimodal.syntheticWavPattern(8000, 2, 3, 40000))
    assert(got.contains(expected))
    // silence has zero energy; corrupt payload → None, never a throw
    assert(Multimodal.audioEnergy(Multimodal.syntheticWav(8000, 1, 16, 50))
      .contains(0L))
    assert(Multimodal.audioEnergy(Array.fill[Byte](32)(0x3C)).isEmpty)
    // 8-bit PCM is outside the 16-bit contract → None, not garbage
    assert(Multimodal.audioEnergy(Multimodal.syntheticWav(8000, 1, 8, 10)).isEmpty)
  }

  test("aHashPartitions: null and undecodable payloads yield null hashes") {
    val media = Seq(
      (1L, Multimodal.syntheticBmpGradient(8, 8, 0)),
      (2L, null: Array[Byte]),
      (3L, Array.fill[Byte](10)(0x7F))
    ).toDF("id", "payload")
    val rows = Multimodal.aHashPartitions(media, "id", "payload")
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("gifFrameAHashes: real per-frame GIF pixel decode matches the arithmetic") {
    // replay the hash per frame from the gradient formula — proves the GIF
    // palette round-trip is LOSSLESS (indexed gray in, identical gray out)
    // and that frames decode independently, not composited
    def expected(w: Int, h: Int, f: Int, seed: Int): Long = {
      val lum = for (j <- 0 until 8; i <- 0 until 8)
        yield (seed + 7 * (i * (w - 1) / 7) + 13 * (j * (h - 1) / 7) + 29 * f) % 256
      val mean = lum.map(_.toLong).sum / 64
      lum.zipWithIndex.filter(_._1 > mean).map(1L << _._2)
        .foldLeft(0L)(_ | _)
    }
    val payload = Multimodal.syntheticGifGradient(11, 9, 3, 40)
    val got = Multimodal.gifFrameAHashes(payload)
    assert(got.contains((0 until 3).map(f => (f, expected(11, 9, f, 40)))))
    // the per-frame hash equals the single-frame core: a 1-frame GIF and a
    // BMP of the same pixels hash identically (cross-container joinable)
    val oneGif = Multimodal.gifFrameAHashes(
      Multimodal.syntheticGifGradient(10, 10, 1, 7)).get.head._2
    val bmp = Multimodal.imageAHash(
      Multimodal.syntheticBmpGradient(10, 10, 7)).get
    assert(oneGif == bmp)
    // corrupt payloads degrade to None, never a throw
    assert(Multimodal.gifFrameAHashes(Array.fill[Byte](12)(0x55)).isEmpty)
  }

  test("frameAHashPartitions: one row per frame; undecodable -> single null row") {
    val media = Seq(
      (1L, Multimodal.syntheticGifGradient(8, 8, 2, 5)),
      (2L, null: Array[Byte])
    ).toDF("id", "payload")
    val rows = Multimodal.frameAHashPartitions(media, "id", "payload")
      .orderBy("id", "frame").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getInt(1) == 0)
    assert(rows(1).getLong(0) == 1L && rows(1).getInt(1) == 1)
    assert(rows(2).getLong(0) == 2L && rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("audioFingerprint: energy-delta sign bits match the replayed arithmetic (X54)") {
    val clip = Multimodal.syntheticWavPattern(8000, 1, 200, 3000)
    val got = Multimodal.audioFingerprint(clip).get
    // replay: the same pattern, framing and delta-sign arithmetic in plain
    // Scala — independent of the decoder under test
    val n = 200
    val e = new Array[Long](64)
    (0 until n).foreach { k =>
      val v = ((3000 + 3 * k) % 65536) - 32768
      e((k.toLong * 64 / n).toInt) += v.toLong * v
    }
    val want = (0 until 63).foldLeft(0L)((acc, k) =>
      if (e(k + 1) > e(k)) acc | (1L << k) else acc)
    assert(got == want)
    assert(got >= 0L, "bit 63 must never be set (sign-safe in any BIGINT replay)")
    // identical clips fingerprint identically (the Hamming-0 near-dup base)
    assert(Multimodal.audioFingerprint(
      Multimodal.syntheticWavPattern(8000, 1, 200, 3000)).get == got)
    // under 64 samples: no frame may be empty -> None
    assert(Multimodal.audioFingerprint(
      Multimodal.syntheticWavPattern(8000, 1, 63, 0)).isEmpty)
    // undecodable bytes degrade to None, never a throw
    assert(Multimodal.audioFingerprint(Array.fill[Byte](32)(0x41)).isEmpty)
  }
}
