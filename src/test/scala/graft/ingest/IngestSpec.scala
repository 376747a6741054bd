package graft.ingest

import java.io.FileOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Table

class IngestSpec extends SparkSpec {

  test("unzip extracts entries and rejects zip-slip (S1)") {
    val dir = Files.createTempDirectory("graft-zip")
    val zip = dir.resolve("a.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zip.toFile))
    zos.putNextEntry(new ZipEntry("data/f1.csv")); zos.write("id\n1\n".getBytes); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("f2.txt")); zos.write("hi".getBytes); zos.closeEntry()
    zos.close()
    val out = Ingest.unzip(zip, dir.resolve("out"))
    assert(out.map(_.getFileName.toString).toSet == Set("f1.csv", "f2.txt"))
    assert(Files.readString(dir.resolve("out/data/f1.csv")) == "id\n1\n")

    val evil = dir.resolve("evil.zip")
    val z2 = new ZipOutputStream(new FileOutputStream(evil.toFile))
    z2.putNextEntry(new ZipEntry("../escape.txt")); z2.write("x".getBytes); z2.closeEntry()
    z2.close()
    intercept[IllegalArgumentException](Ingest.unzip(evil, dir.resolve("out2")))
  }

  test("csvLoad parses with explicit schema into a parquet table (S2)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(Paths.get(s"$dir/in.csv"), "id;name\n1;alpha\n2;\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    val t = Ingest.csvLoad(spark, s"$dir/in.csv", Table(spark, dir, "loaded"),
      schema, header = true, delimiter = ";")
    val rows = t.read.orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows(1).isNullAt(1)) // empty string -> null via nullValue
  }

  test("shapefile reader parses point records to WKB (S3)") {
    // Hand-build a minimal .shp: header + two point records, per the public
    // ESRI spec (file code 9994, LE shape type 1, x/y doubles).
    val recs = Seq((1, 2.5, -3.5), (2, 0.0, 7.25))
    val contentBytes = 20 // int type + 2 doubles
    val fileLen = 100 + recs.size * (8 + contentBytes)
    val buf = ByteBuffer.allocate(fileLen)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, fileLen / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(32, 1000) // version
    buf.putInt(36, 1)    // shape type point
    var off = 100
    recs.foreach { case (no, x, y) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(off, no); buf.putInt(off + 4, contentBytes / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(off + 8, 1); buf.putDouble(off + 12, x); buf.putDouble(off + 20, y)
      off += 8 + contentBytes
    }
    val dir = Files.createTempDirectory("graft-shp")
    val shp = dir.resolve("pts.shp")
    Files.write(shp, buf.array())

    val df = Shapefile.read(spark, shp.toString)
    val rows = df.orderBy("record_no").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getInt(1) == 1))
    val wkb = ByteBuffer.wrap(rows(0).getAs[Array[Byte]]("geom_wkb")).order(ByteOrder.LITTLE_ENDIAN)
    assert(wkb.get(0) == 1 && wkb.getInt(1) == 1)
    assert(wkb.getDouble(5) == 2.5 && wkb.getDouble(13) == -3.5)
  }
}
