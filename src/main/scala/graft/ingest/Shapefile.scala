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
  * (little-endian shape). Point (1), PolyLine (3), Polygon (5) and
  * MultiPoint (8) content is converted to standard WKB — the full set of 2D
  * geometry classes `shp2pgsql` loads (operators/shp2pgsql.py:15-26);
  * remaining shape types (measured/Z variants) pass through as raw content
  * bytes with their type tag, which preserves round-trip fidelity without a
  * geometry engine.
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
      val wkb = shapeType match {
        case 1 if contentBytes >= 20 =>
          val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
          pointWkb(c.getDouble(4), c.getDouble(12))
        case 3 if contentBytes >= 44 => polyLineWkb(parseParts(content))
        case 5 if contentBytes >= 44 => polygonWkb(parseParts(content))
        case 8 if contentBytes >= 40 => multiPointWkb(parseMultiPoint(content))
        case _ => null
      }
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

  /** ESRI MultiPoint record body (spec p. 6): type(4) + bbox(32) +
    * numPoints(4), then numPoints × 16-byte (x, y) pairs at offset 40. */
  private def parseMultiPoint(content: Array[Byte]): Seq[(Double, Double)] = {
    val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    // clamp to what the record actually holds: a corrupt numPoints must not
    // read past the buffer and crash the whole file parse (other malformed
    // shapes degrade to passthrough rows, not exceptions)
    val numPoints = math.min(c.getInt(36), (content.length - 40) / 16)
    Seq.tabulate(math.max(numPoints, 0))(i =>
      (c.getDouble(40 + 16 * i), c.getDouble(40 + 16 * i + 8)))
  }

  /** ESRI MultiPoint → WKB MultiPoint (type 4): each member a full nested
    * WKB Point with its own byte-order mark — the shp2pgsql mapping
    * (operators/shp2pgsql.py:15-26 loads every 2D class as geometry). */
  def multiPointWkb(pts: Seq[(Double, Double)]): Array[Byte] = {
    val b = ByteBuffer.allocate(9 + 21 * pts.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(4); b.putInt(pts.length)
    pts.foreach { case (x, y) => b.put(pointWkb(x, y)) }
    b.array()
  }

  /** Shared PolyLine/Polygon record body: bbox, part start indices, points
    * (ESRI spec pp. 7-9) → one (x, y) sequence per part. */
  private def parseParts(content: Array[Byte]): Seq[Array[(Double, Double)]] = {
    val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    val numParts = c.getInt(36)
    val numPoints = c.getInt(40)
    val partStarts = Array.tabulate(numParts)(i => c.getInt(44 + 4 * i))
    val pointsOff = 44 + 4 * numParts
    val pts = Array.tabulate(numPoints)(i =>
      (c.getDouble(pointsOff + 16 * i), c.getDouble(pointsOff + 16 * i + 8)))
    (0 until numParts).map { p =>
      val from = partStarts(p)
      val until = if (p + 1 < numParts) partStarts(p + 1) else numPoints
      pts.slice(from, until)
    }
  }

  private def putLinearRing(b: ByteBuffer, pts: Array[(Double, Double)]): Unit = {
    b.putInt(pts.length)
    pts.foreach { case (x, y) => b.putDouble(x); b.putDouble(y) }
  }

  /** ESRI PolyLine → WKB MultiLineString (type 5): one LineString per part —
    * the shp2pgsql mapping for linework. */
  def polyLineWkb(parts: Seq[Array[(Double, Double)]]): Array[Byte] = {
    val size = 9 + parts.map(p => 9 + 16 * p.length).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(5); b.putInt(parts.length)
    parts.foreach { p =>
      b.put(1.toByte); b.putInt(2) // nested LineString, own byte-order mark
      putLinearRing(b, p)
    }
    b.array()
  }

  /** ESRI Polygon → WKB MultiPolygon (type 6), the shp2pgsql mapping. ESRI
    * rings are closed; outer rings wind CLOCKWISE (negative shoelace area),
    * holes counter-clockwise and, per the spec's packing convention, follow
    * their outer ring — so each CW ring starts a new polygon and subsequent
    * CCW rings attach to it as holes. (Exact hole-to-outer containment
    * testing needs a geometry engine; the sequential convention is what the
    * format guarantees in practice.) */
  def polygonWkb(parts: Seq[Array[(Double, Double)]]): Array[Byte] = {
    def signedArea2(p: Array[(Double, Double)]): Double =
      p.indices.map { i =>
        val (x1, y1) = p(i); val (x2, y2) = p((i + 1) % p.length)
        x1 * y2 - x2 * y1
      }.sum
    val polys = Seq.newBuilder[Seq[Array[(Double, Double)]]]
    var current: List[Array[(Double, Double)]] = Nil
    parts.foreach { ring =>
      val isOuter = signedArea2(ring) <= 0 // CW in ESRI convention
      if (isOuter && current.nonEmpty) { polys += current.reverse; current = Nil }
      current = ring :: current
    }
    if (current.nonEmpty) polys += current.reverse
    val ps = polys.result()
    val size = 9 + ps.map(rings => 9 + rings.map(r => 4 + 16 * r.length).sum).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(6); b.putInt(ps.length)
    ps.foreach { rings =>
      b.put(1.toByte); b.putInt(3); b.putInt(rings.length)
      rings.foreach(putLinearRing(b, _))
    }
    b.array()
  }

  /** Load a `.shp` as a DataFrame (geometry as WKB, reference `-d` drop-and-
    * recreate semantics come from the caller's `Table.overwrite`). */
  def read(spark: SparkSession, shpPath: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(parse(shpPath).asJava, schema)
  }
}
