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
}
