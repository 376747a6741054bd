package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2.9 X5): image/audio/video travel
  * as opaque `binary` payloads with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample are per-partition batch
  * transformations over those payloads.
  *
  * IMAGE decode is REAL: [[imageDims]] reads PNG/JPEG/GIF/BMP headers via
  * the JDK's `javax.imageio` (no external codec needed), [[imageAHash]] /
  * [[imageResizeNearest]] decode full pixels, and [[gifFrameAHashes]]
  * decodes every frame of an animated GIF. AUDIO decode is REAL for
  * WAV/AIFF/AU via `javax.sound.sampled` — headers ([[audioMeta]]) and
  * 16-bit PCM samples ([[audioEnergy]]). Compressed audio (mp3/aac) and
  * video decode remain STUBBED with a deterministic fake ([[stubDecode]],
  * also the fallback for unrecognized image formats) — no such codec
  * exists in this container. The Spark-side
  * plumbing is real either way: schema
  * (`payload: binary, meta: struct`), partition-wise batch execution via
  * `mapPartitions` (the Scala analog of `mapInPandas` batches), and
  * pure-column metadata ops that stay in codegen.
  *
  * Scale notes: payloads never pass through the driver; `mapPartitions`
  * processes one task's worth of media at a time, so executor memory bounds
  * batch size via `spark.sql.files.maxPartitionBytes`. For real codecs the
  * decoder handle is created once per partition (not per row) — the iterator
  * structure below already has that shape.
  */
object Multimodal {

  /** Media metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary column into graft's media struct with byte-level metadata
    * (decode-independent: size + declared format). Pure column expression. */
  def media(payload: org.apache.spark.sql.Column, format: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    struct(
      payload.as("payload"),
      struct(
        format.as("format"),
        length(payload).cast(LongType).as("n_bytes"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height")).as("meta"))

  /** STUB decoder — deterministic fake standing in for a real image decode
    * (??? in spirit: no codec exists in this environment). Derives stable
    * pseudo-dimensions from payload bytes so tests are reproducible. A real
    * deployment replaces only this function with e.g. a JNI codec call. */
  def stubDecode(payload: Array[Byte]): (Int, Int) = {
    // derived from the byte COUNT only: a content-derived term (e.g. the
    // first byte) is not reproducible by a SQL oracle, whose string
    // functions see characters/codepoints, not UTF-8 bytes
    val n = payload.length
    (n % 640 + 16, (n * 7 + n % 251) % 480 + 16)
  }

  /** REAL image header decode via the JDK's `javax.imageio` — PNG, JPEG, GIF
    * and BMP readers ship with every JDK, so actual width/height need no
    * external codec. Reads ONLY the header (`ImageReader.getWidth/getHeight`
    * on the stream, never `ImageIO.read`'s full-pixel decode) — constant
    * work per image regardless of pixel count, which is what a metadata
    * pass over 100 TB of media requires. None for unrecognized formats. */
  def imageDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0)))
        } catch {
          // NonFatal, not just IOException: ImageIO readers throw unchecked
          // exceptions on malformed-but-recognized headers, and a corrupt
          // payload must fall back, never kill the task (after 4 retries
          // that would abort a whole 100 TB job on one bad image)
          case scala.util.control.NonFatal(_) => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Production decoder: real header decode with the stub as the documented
    * fallback for formats the JDK has no reader for. */
  def imageDecode(payload: Array[Byte]): (Int, Int) =
    imageDims(payload).getOrElse(stubDecode(payload))

  /** Partition-batched decode: (id, payload) → (id, width, height). The
    * decoder is invoked once per row but initialized once per partition —
    * the real-codec shape. A null payload (routine for opaque media columns)
    * yields null dimensions rather than killing the task. Returns columns
    * (id, width, height). Pass [[imageDecode]] to read real image headers;
    * the default stays the deterministic stub (oracle-reproducible). */
  def decodePartitions(df: DataFrame, id: String, payload: String,
      decode: Array[Byte] => (Int, Int) = stubDecode): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init goes here (JNI handle, model load, ...)
        it.map { case (rowId, bytes) =>
          if (bytes == null) (rowId, None: Option[Int], None: Option[Int])
          else {
            val (w, h) = decode(bytes)
            (rowId, Some(w), Some(h))
          }
        }
      }
      .toDF(id, "width", "height")
  }

  /** REAL multi-frame container decode via `javax.imageio`: the number of
    * frames in an animated image (the JDK ships a GIF reader; single-frame
    * formats report 1). `allowSearch = true` walks the frame chain without
    * decoding pixels — O(container bytes), the metadata-pass cost profile.
    * None for unrecognized or corrupt payloads. This is the real face of
    * video-style frame sampling: [[sampleFrames]] picks byte windows for
    * codec-less containers, `frameCount` + per-frame header reads cover
    * containers the JDK can actually parse. */
  def frameCount(payload: Array[Byte]): Option[Int] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, false, true) // seekForwardOnly=false: counting seeks
          Some(r.getNumImages(true))
        } catch {
          case scala.util.control.NonFatal(_) => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Audio metadata decoded from container headers. `durationSec` is None
    * when the container does not declare a frame count. */
  final case class AudioMeta(
      encoding: String, sampleRate: Double, channels: Int,
      bitsPerSample: Int, nFrames: Long, durationSec: Option[Double])

  /** REAL audio header decode via the JDK's `javax.sound.sampled` — WAV,
    * AIFF and AU readers ship with every JDK, so sample rate / channels /
    * bit depth / duration need no external codec. Reads only the container
    * header (`getAudioFileFormat`, never a full sample decode) — constant
    * work per clip. None for unrecognized or corrupt payloads: a bad clip
    * must fall back, never kill the task. Compressed codecs (mp3, aac, ...)
    * have no JDK reader and land on the None path — that decode stays
    * stubbed in this container, as documented in the object scaladoc. */
  def audioMeta(payload: Array[Byte]): Option[AudioMeta] = {
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val f = aff.getFormat
      val frames = aff.getFrameLength.toLong // NOT_SPECIFIED = -1
      val dur =
        if (frames >= 0 && f.getFrameRate > 0) Some(frames / f.getFrameRate.toDouble)
        else None
      Some(AudioMeta(f.getEncoding.toString, f.getSampleRate.toDouble,
        f.getChannels, f.getSampleSizeInBits, frames, dur))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Partition-batched audio decode: (id, payload) → one metadata row per
    * clip, same execution shape as [[decodePartitions]] (per-partition
    * decoder init, null payload → null metadata, never a task kill). */
  def audioDecodePartitions(df: DataFrame, id: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          val m = Option(bytes).flatMap(audioMeta)
          (rowId, m.map(_.encoding), m.map(_.sampleRate), m.map(_.channels),
            m.map(_.bitsPerSample), m.map(_.nFrames), m.flatMap(_.durationSec))
        }
      }
      .toDF(id, "encoding", "sample_rate", "channels", "bits_per_sample",
        "n_frames", "duration_sec")
  }

  /** Synthetic 24-bit BMP of the given dimensions (valid BITMAPINFOHEADER +
    * zeroed BI_RGB pixel rows). Deterministic fixture generator: real media
    * rarely travels with test data, so pipeline smoke tests synthesize
    * payloads whose TRUE dimensions are a pure function of the row — which
    * lets an external oracle verify the real [[imageDims]] header decode
    * arithmetically (the q98 pattern) instead of trusting the stub. */
  def syntheticBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got ${width}x$height")
    val rowSize = ((24 * width + 31) / 32) * 4 // BMP rows pad to 4 bytes
    val dataSize = rowSize * height
    val b = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putShort(0).putShort(0).putInt(54) // file header
      .putInt(40).putInt(width).putInt(height)                  // info header
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.array() // pixel rows stay zeroed (black) — header decode never reads them
  }

  /** [[syntheticBmp]] with a deterministic gray gradient instead of zeroed
    * pixels: the pixel at image coordinates (x, y) — top-left origin — has
    * r = g = b = (seed + 7·x + 13·y) mod 256. BMP stores rows bottom-up, so
    * the LAST stored row is logical y = 0; writing in reverse keeps the
    * formula's origin at the decoded top-left. With r = g = b = v the
    * integer Rec.601 luma (299r + 587g + 114b)/1000 is exactly v, which is
    * what lets a SQL oracle replay [[imageAHash]] over the REAL pixel
    * decode arithmetically. */
  def syntheticBmpGradient(width: Int, height: Int, seed: Int): Array[Byte] = {
    val bytes = syntheticBmp(width, height)
    val rowSize = ((24 * width + 31) / 32) * 4
    var y = 0
    while (y < height) {
      val rowStart = 54 + (height - 1 - y) * rowSize // stored bottom-up
      var x = 0
      while (x < width) {
        val v = ((seed + 7 * x + 13 * y) % 256).toByte
        val p = rowStart + 3 * x
        bytes(p) = v; bytes(p + 1) = v; bytes(p + 2) = v // BGR, all = v
        x += 1
      }
      y += 1
    }
    bytes
  }

  /** REAL perceptual average-hash (aHash) over a full pixel decode: 64-bit
    * fingerprint for image near-dup detection — the multimodal counterpart
    * of SimHash on text. `ImageIO.read` decodes the pixels (PNG/JPEG/GIF/
    * BMP via the JDK), an 8×8 grid point-samples luma at
    * (x, y) = (i·(w−1)/7, j·(h−1)/7) — integer division, so exactly
    * replayable — and bit 8·j+i is set iff that sample's Rec.601 integer
    * luma exceeds the integer mean of all 64 samples. Point sampling rather
    * than box averaging keeps the oracle replay O(64) per image without
    * changing the invariance class (both are stable under mild re-encoding;
    * neither survives crops — that is MinHash-over-tiles territory).
    *
    * O(pixels) per image and embarrassingly parallel; None for payloads no
    * JDK reader decodes (a corrupt image must never kill a 100 TB task). */
  def imageAHash(payload: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map(aHashOf)
  }

  /** The aHash core over an already-decoded image — shared by
    * [[imageAHash]] (single-frame payloads) and [[gifFrameAHashes]]
    * (per-frame), which MUST hash identically for cross-container
    * near-dup joins to be meaningful. */
  private def aHashOf(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth; val h = im.getHeight
    val lum = new Array[Int](64)
    var sum = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val rgb = im.getRGB(i * (w - 1) / 7, j * (h - 1) / 7)
        val l = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
          + 114 * (rgb & 0xFF)) / 1000
        lum(8 * j + i) = l
        sum += l
        i += 1
      }
      j += 1
    }
    val mean = sum / 64 // integer floor — the oracle's sum(lum)//64
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (lum(k) > mean) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Partition-batched aHash: (id, payload) → (id, ahash), null/undecodable
    * payload → null hash — the [[decodePartitions]] execution shape. */
  def aHashPartitions(df: DataFrame, id: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          (rowId, Option(bytes).flatMap(imageAHash))
        }
      }
      .toDF(id, "ahash")
  }

  /** Synthetic PCM WAV container (RIFF/fmt/data chunks, zeroed samples) —
    * the audio counterpart of [[syntheticBmp]], decodable by the real
    * [[audioMeta]] path with every field a pure function of the inputs. */
  def syntheticWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0,
      s"bad WAV params: rate=$sampleRate ch=$channels frames=$nFrames")
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0,
      s"bitsPerSample must be a positive multiple of 8, got $bitsPerSample")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                          // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign)      // byte rate
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.array() // samples stay zeroed (silence) — header decode never reads them
  }

  /** [[syntheticWav]] with a deterministic 16-bit sample pattern instead of
    * silence: interleaved sample k (frame-major, channel-minor) is
    * ((seed + 3·k) mod 65536) − 32768, little-endian signed — every sample
    * a pure function of (seed, k), which lets a SQL oracle verify a REAL
    * sample decode arithmetically (the gradient-BMP trick for audio). */
  def syntheticWavPattern(sampleRate: Int, channels: Int, nFrames: Int,
      seed: Int): Array[Byte] = {
    val bytes = syntheticWav(sampleRate, channels, 16, nFrames)
    val n = nFrames * channels
    var k = 0
    while (k < n) {
      val s = ((seed + 3 * k) % 65536) - 32768
      bytes(44 + 2 * k) = (s & 0xFF).toByte
      bytes(44 + 2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    bytes
  }

  /** REAL audio SAMPLE decode: total signal energy Σ sample² over every
    * frame and channel, via `javax.sound.sampled`'s stream decode — the
    * sample-level counterpart of [[audioMeta]]'s header-only read, and the
    * audio analog of [[imageAHash]]'s full-pixel decode. Exact integer
    * arithmetic (16-bit samples, long accumulation: 2³¹ samples max before
    * overflow could matter — a 13-hour stereo clip), so the result is
    * bit-identical on any engine. None for anything that is not 16-bit
    * signed PCM or that no JDK reader decodes — corrupt or exotic clips
    * degrade, never kill the task. O(clip bytes) per clip. */
  /** The ONE PCM16 decode path both [[audioEnergy]] and
    * [[audioFingerprint]] fold over: JDK stream decode, 16-bit signed PCM
    * gate, endian-correct sample extraction. A format edge-case fix lands
    * here once. None for non-PCM16 / undecodable payloads. */
  private def pcm16Samples(payload: Array[Byte]): Option[Array[Int]] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val ok = f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16
        if (!ok) None
        else {
          val data = in.readAllBytes()
          val even = data.length - (data.length % 2)
          val out = new Array[Int](even / 2)
          var i = 0
          while (i < even) {
            out(i / 2) =
              if (f.isBigEndian) (data(i) << 8) | (data(i + 1) & 0xFF)
              else (data(i + 1) << 8) | (data(i) & 0xFF)
            i += 2
          }
          Some(out)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def audioEnergy(payload: Array[Byte]): Option[Long] =
    pcm16Samples(payload).map { samples =>
      var sum = 0L
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        sum += s.toLong * s
        i += 1
      }
      sum
    }

  /** Partition-batched sample-energy decode: (id, payload) → (id, energy),
    * null/undecodable/non-PCM16 payload → null — the [[decodePartitions]]
    * execution shape. */
  def audioEnergyPartitions(df: DataFrame, id: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          (rowId, Option(bytes).flatMap(audioEnergy))
        }
      }
      .toDF(id, "energy")
  }

  /** X54 — audio perceptual fingerprint: the chromaprint/Shazam family's
    * core move reduced to its deterministic skeleton — the interleaved
    * sample stream splits into 64 equal frames (frame of sample i =
    * ⌊i·64/n⌋), each frame's energy Σ sample² accumulates exactly in a
    * long, and bit k (k = 0..62) of the fingerprint is the SIGN of the
    * energy delta e(k+1) > e(k). 63 bits so the value stays non-negative
    * in a signed 64-bit long on every engine (bit 63 would flip the sign
    * in any BIGINT replay). Energy-delta signs are what survive volume
    * scaling and re-encoding in the real algorithms; here the point is a
    * REAL sample-level decode whose every bit an oracle can replay.
    * Same hash-with-Hamming-locality contract as [[imageAHash]], so audio
    * near-dup REUSES `Dedup.simHashPairsOnSigs` unchanged. None for
    * non-PCM16, undecodable payloads, or clips with fewer than 64
    * samples (no frame may be empty). */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    pcm16Samples(payload).filter(_.length >= 64).map { samples =>
      val n = samples.length
      val e = new Array[Long](64)
      var i = 0
      while (i < n) {
        val s = samples(i)
        e((i.toLong * 64 / n).toInt) += s.toLong * s
        i += 1
      }
      var fp = 0L
      var k = 0
      while (k < 63) {
        if (e(k + 1) > e(k)) fp |= 1L << k
        k += 1
      }
      fp
    }

  /** [[audioFingerprint]] over a payload column — the per-partition
    * batching shape of [[audioEnergyPartitions]]. Output: (id, fp). */
  def audioFingerprintPartitions(df: DataFrame, id: String,
      payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          (rowId, Option(bytes).flatMap(audioFingerprint))
        }
      }
      .toDF(id, "fp")
  }

  /** Synthetic animated GIF with the given frame count (the JDK ships a GIF
    * writer) — the multi-frame counterpart of [[syntheticBmp]], decodable by
    * the real [[frameCount]] path with the true frame count a pure function
    * of the input. Frames are minimal 4×4 images; the container, not the
    * pixels, is the thing under test. */
  def syntheticGif(nFrames: Int): Array[Byte] = {
    require(nFrames >= 1, s"need at least one frame, got $nFrames")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { _ =>
        val img = new java.awt.image.BufferedImage(4, 4,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** [[syntheticGif]] with deterministic per-frame gray gradients instead
    * of blank frames: frame f's pixel (x, y) has gray value
    * (seed + 7·x + 13·y + 29·f) mod 256 — [[syntheticBmpGradient]]'s
    * formula extended along the frame axis, so every sample of every frame
    * is a pure function of the inputs and a SQL oracle can replay a REAL
    * multi-frame decode arithmetically. Frames are written TYPE_BYTE_INDEXED
    * over an explicit 256-entry gray palette: the JDK GIF writer then
    * stores the palette verbatim (lossless round-trip) instead of
    * quantizing RGB input to its default color cube. */
  def syntheticGifGradient(width: Int, height: Int, nFrames: Int,
      seed: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got ${width}x$height")
    require(nFrames >= 1, s"need at least one frame, got $nFrames")
    val gray = Array.tabulate[Byte](256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, (seed + 7 * x + 13 * y + 29 * f) % 256)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** REAL multi-frame decode: every frame of an animated container decoded
    * to pixels and aHashed — (frame index, hash) pairs, via the indexed
    * `ImageReader` API ([[frameCount]]'s header-only read taken to the
    * pixel level; the JDK ships a GIF reader, so animated GIFs are fully
    * decodable without any external codec). Frame hashes use the SAME
    * [[imageAHash]] core, so GIF frames join against BMP/PNG stills in
    * X38's near-dup pass. None when no installed reader recognizes the
    * container or any frame fails to decode — corrupt payloads degrade,
    * never kill a task. */
  def gifFrameAHashes(payload: Array[Byte]): Option[Seq[(Int, Long)]] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false: indexed access; getNumImages(true)
            // walks the whole stream so the count is exact, not a header
            // field taken on faith
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            Some((0 until n).map(i => (i, aHashOf(reader.read(i)))))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Partition-batched per-frame hashing: (id, payload) → one row per
    * decoded frame (id, frame, ahash); an undecodable payload emits a
    * single (id, null, null) row so the failure is visible in the output
    * rather than silently absent (the [[decodePartitions]] convention). */
  def frameAHashPartitions(df: DataFrame, id: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .flatMap { case (rowId, bytes) =>
        Option(bytes).flatMap(gifFrameAHashes) match {
          case Some(frames) =>
            frames.map { case (f, h) => (rowId, Some(f), Some(h)) }
          case None => Seq((rowId, Option.empty[Int], Option.empty[Long]))
        }
      }
      .toDF(id, "frame", "ahash")
  }

  /** Partition-batched frame counting: (id, payload) → (id, n_frames),
    * null payload / unrecognized container → null count — the same
    * never-kill-the-task shape as [[decodePartitions]]. */
  def frameCountPartitions(df: DataFrame, id: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          (rowId, Option(bytes).flatMap(frameCount))
        }
      }
      .toDF(id, "n_frames")
  }

  /** Encode a width×height image as a 24-bit BMP from a pixel function
    * `rgb(x, y) -> 0xRRGGBB` (top-left origin). The write-side dual of the
    * ImageIO decode: together they make pixel TRANSFORMS (resize, crop,
    * re-encode) real rather than metadata-only. Rows are written bottom-up
    * with 4-byte padding per the format. */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val bytes = syntheticBmp(width, height) // valid header + zeroed rows
    val rowSize = ((24 * width + 31) / 32) * 4
    var y = 0
    while (y < height) {
      val rowStart = 54 + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val v = rgb(x, y)
        val p = rowStart + 3 * x
        bytes(p) = (v & 0xFF).toByte            // B
        bytes(p + 1) = ((v >> 8) & 0xFF).toByte // G
        bytes(p + 2) = ((v >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    bytes
  }

  /** REAL nearest-neighbor pixel resize: full ImageIO decode, integer
    * source mapping `src = dst·srcDim / dstDim` (floor — exactly
    * replayable by an external engine's integer division), re-encoded as
    * 24-bit BMP via [[encodeBmp]]. O(dst pixels) per image after the
    * decode; None for payloads no JDK reader decodes — a corrupt image
    * degrades, never kills the task. Deterministic: the output bytes are
    * a pure function of the input pixels and the target box. */
  def imageResizeNearest(payload: Array[Byte], dstW: Int, dstH: Int)
      : Option[Array[Byte]] = {
    require(dstW > 0 && dstH > 0, s"need positive target dims, got ${dstW}x$dstH")
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { im =>
      val sw = im.getWidth; val sh = im.getHeight
      encodeBmp(dstW, dstH, (x, y) =>
        im.getRGB(x * sw / dstW, y * sh / dstH) & 0xFFFFFF)
    }
  }

  /** Partition-batched resize: (id, payload) → (id, payload) with every
    * decodable image resampled to the target box — the
    * [[decodePartitions]] execution shape (per-partition decoder init,
    * null/undecodable payload → null, never a task kill). Composes with
    * [[aHashPartitions]]/[[decodePartitions]] downstream: the output is a
    * decodable BMP payload column like the input. */
  def resizePartitions(df: DataFrame, id: String, payload: String,
      dstW: Int, dstH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (rowId, bytes) =>
          (rowId, Option(bytes).flatMap(imageResizeNearest(_, dstW, dstH)))
        }
      }
      .toDF(id, payload)
  }

  /** Resize stub: recomputes the metadata dimensions to the target box
    * preserving aspect ratio (real pixel resampling would replace the
    * payload via [[decodePartitions]]-style batching; the metadata algebra
    * and column plumbing are the real part — and [[imageResizeNearest]] /
    * [[resizePartitions]] are now that real resample for formats the JDK
    * decodes). */
  def resizeMeta(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      maxW: Int, maxH: Int): org.apache.spark.sql.Column = {
    val scale = least(lit(maxW) / width.cast("double"), lit(maxH) / height.cast("double"), lit(1.0))
    struct(
      floor(width * scale).cast(IntegerType).as("width"),
      floor(height * scale).cast(IntegerType).as("height"))
  }

  /** Frame sampling stub: n evenly-spaced fixed-size byte windows from the
    * payload (a video decoder would emit decoded frames; the slicing/batching
    * shape is identical). Pure column expression over binary. */
  def sampleFrames(payload: org.apache.spark.sql.Column, n: Int, frameBytes: Int)
      : org.apache.spark.sql.Column = {
    // n = 0 would make sequence(0, -1) a DESCENDING [0, -1] (the same trap
    // TextStats.chunk guards), silently emitting two garbage frames
    require(n >= 1, "need at least one frame")
    require(frameBytes > 0, "frameBytes must be positive")
    transform(sequence(lit(0), lit(n - 1)), i => {
      val len = length(payload)
      val start = (i * greatest(len - frameBytes, lit(0)) / lit(math.max(n - 1, 1))) + 1
      payload.substr(start.cast(IntegerType), lit(frameBytes))
    })
  }
}
