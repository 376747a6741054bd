package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S3 — `Shp2pgsqlOperator` analog (reference operators/shp2pgsql.py:11-27:
  * ESRI shapefile → PostGIS table, drop-and-recreate): a minimal, dependency-
  * free ESRI `.shp` reader producing a DataFrame with geometry as WKB bytes
  * (the same on-the-wire form PostGIS stores).
  *
  * Format per the public ESRI Shapefile Technical Description (July 1998):
  * 100-byte header (big-endian file code 9994, little-endian shape type),
  * then records of [record number, content length] (big-endian) + content
  * (little-endian shape). Point (type 1) content is converted to standard
  * WKB; other shape types pass through as raw content bytes with their type
  * tag, which preserves round-trip fidelity without a geometry engine.
  *
  * Scale: one `.shp` file parses on the driver (shapefiles cap at 2 GB by
  * format); a directory of shapefiles should be parallelized one file per
  * task upstream. After landing as parquet the geometry column is ordinary
  * distributed binary data.
  */
object Shapefile {

  val schema: StructType = StructType(Seq(
    StructField("record_no", IntegerType, nullable = false),
    StructField("shape_type", IntegerType, nullable = false),
    StructField("geom_wkb", BinaryType), // standard WKB for points; null for passthrough shapes
    StructField("shape_raw", BinaryType))) // original little-endian shape content

  /** Parse one `.shp` into rows of [[schema]]. */
  def parse(shpPath: String): Seq[Row] = {
    val bytes = Files.readAllBytes(Paths.get(shpPath))
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    val fileCode = buf.getInt(0)
    require(fileCode == 9994, s"not a shapefile (file code $fileCode)")
    val fileLenWords = buf.getInt(24) // 16-bit words, includes header
    val rows = Seq.newBuilder[Row]
    var off = 100
    val end = fileLenWords * 2
    while (off + 8 <= end) {
      val recNo = buf.getInt(off)
      val contentWords = buf.getInt(off + 4)
      val contentBytes = contentWords * 2
      val content = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + contentBytes)
      val shapeType = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
      val wkb = if (shapeType == 1 && contentBytes >= 20) {
        val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
        pointWkb(c.getDouble(4), c.getDouble(12))
      } else null
      rows += Row(recNo, shapeType, wkb, content)
      off += 8 + contentBytes
    }
    rows.result()
  }

  /** Standard little-endian WKB for POINT(x y). */
  def pointWkb(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte) // little-endian marker
    b.putInt(1)     // wkb type: point
    b.putDouble(x)
    b.putDouble(y)
    b.array()
  }

  /** Load a `.shp` as a DataFrame (geometry as WKB, reference `-d` drop-and-
    * recreate semantics come from the caller's `Table.overwrite`). */
  def read(spark: SparkSession, shpPath: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(parse(shpPath).asJava, schema)
  }
}
