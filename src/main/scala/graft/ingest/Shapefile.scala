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
  * (little-endian shape). All geometry classes `shp2pgsql` loads
  * (operators/shp2pgsql.py:15-26) convert to standard WKB:
  *
  *  - 2D: Point (1), PolyLine (3), Polygon (5), MultiPoint (8)
  *  - Z:  PointZ (11), PolyLineZ (13), PolygonZ (15), MultiPointZ (18) —
  *    ISO WKB with type offset 1000 (ZM → 3000 when the optional measure
  *    block is present and carries at least one real value)
  *  - M:  PointM (21), PolyLineM (23), PolygonM (25), MultiPointM (28) —
  *    ISO WKB with type offset 2000
  *
  * Measures use the spec's no-data convention (values < -10^38 mean "no
  * measure"); a record whose M block is absent or entirely no-data drops the
  * M dimension, matching shp2pgsql's treatment of unset measures. Unknown or
  * malformed shapes degrade to passthrough rows (raw content preserved,
  * `geom_wkb` null) — never exceptions, so one corrupt record cannot kill a
  * whole-file load.
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
    StructField("geom_wkb", BinaryType), // standard WKB; null for passthrough shapes
    StructField("shape_raw", BinaryType))) // original little-endian shape content

  /** ESRI "no data" floor for optional Z/M values (spec p. 2). */
  private val NoData = -1e38

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
      // malformed counts/offsets inside one record degrade that record to a
      // passthrough row instead of killing the whole file parse
      val wkb = try shapeType match {
        case 1 if contentBytes >= 20  => parsePointRec(content, hasZ = false, hasM = false)
        case 11 if contentBytes >= 28 => parsePointRec(content, hasZ = true,
          hasM = contentBytes >= 36)
        case 21 if contentBytes >= 28 => parsePointRec(content, hasZ = false, hasM = true)
        case 3 if contentBytes >= 44  => partsWkb(content, 5, hasZ = false, typeM = false)
        case 13 if contentBytes >= 44 => partsWkb(content, 5, hasZ = true, typeM = false)
        case 23 if contentBytes >= 44 => partsWkb(content, 5, hasZ = false, typeM = true)
        case 5 if contentBytes >= 44  => partsWkb(content, 6, hasZ = false, typeM = false)
        case 15 if contentBytes >= 44 => partsWkb(content, 6, hasZ = true, typeM = false)
        case 25 if contentBytes >= 44 => partsWkb(content, 6, hasZ = false, typeM = true)
        case 8 if contentBytes >= 40  => multiPointRec(content, hasZ = false, typeM = false)
        case 18 if contentBytes >= 40 => multiPointRec(content, hasZ = true, typeM = false)
        case 28 if contentBytes >= 40 => multiPointRec(content, hasZ = false, typeM = true)
        case _ => null
      } catch { case scala.util.control.NonFatal(_) => null }
      rows += Row(recNo, shapeType, wkb, content)
      off += 8 + contentBytes
    }
    rows.result()
  }

  // ---------------------------------------------------------------- records

  /** Point / PointZ / PointM record body: x, y[, z][, m] (spec pp. 5, 10, 14). */
  private def parsePointRec(content: Array[Byte], hasZ: Boolean, hasM: Boolean): Array[Byte] = {
    val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    val x = c.getDouble(4); val y = c.getDouble(12)
    val z = if (hasZ) Some(c.getDouble(20)) else None
    val mOff = if (hasZ) 28 else 20
    val m = if (hasM) Some(c.getDouble(mOff)).filter(_ > NoData) else None
    val coords = Array(x, y) ++ z ++ m
    coordsWkb(1, z.isDefined, m.isDefined, coords.length) { b =>
      coords.foreach(b.putDouble)
    }
  }

  /** MultiPoint family record body (spec pp. 6, 13, 16): type(4) + bbox(32) +
    * numPoints(4), then numPoints × (x, y) at offset 40, then for Z/M types
    * the optional range(16) + values(8×n) blocks. */
  private def multiPointRec(content: Array[Byte], hasZ: Boolean, typeM: Boolean): Array[Byte] = {
    val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    // clamp to what the record actually holds: a corrupt numPoints must not
    // read past the buffer and crash the whole file parse
    val n = math.max(math.min(c.getInt(36), (content.length - 40) / 16), 0)
    val xy = Array.tabulate(n)(i => (c.getDouble(40 + 16 * i), c.getDouble(40 + 16 * i + 8)))
    val zOff = 40 + 16 * n
    val zs = readValueBlock(c, content.length, zOff, n, hasZ)
    val mOff = if (hasZ) zOff + 16 + 8 * n else zOff
    val ms = readValueBlock(c, content.length, mOff, n, typeM || hasZ)
      .filter(_.exists(_ > NoData)) // all-no-data measures drop the dimension
    multiPointWkbNd(xy.toSeq, zs, ms)
  }

  /** PolyLine/Polygon family record body (spec pp. 7-9, 11-13, 15-16): bbox,
    * part start indices, (x, y) points, then optional Z and M blocks. */
  private def partsWkb(content: Array[Byte], wkbBase: Int, hasZ: Boolean,
      typeM: Boolean): Array[Byte] = {
    val c = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    val numParts = c.getInt(36)
    val numPoints = c.getInt(40)
    val partStarts = Array.tabulate(numParts)(i => c.getInt(44 + 4 * i))
    val pointsOff = 44 + 4 * numParts
    val pts = Array.tabulate(numPoints)(i =>
      (c.getDouble(pointsOff + 16 * i), c.getDouble(pointsOff + 16 * i + 8)))
    val zOff = pointsOff + 16 * numPoints
    val zs = readValueBlock(c, content.length, zOff, numPoints, hasZ)
    val mOff = if (hasZ) zOff + 16 + 8 * numPoints else zOff
    val ms = readValueBlock(c, content.length, mOff, numPoints, typeM || hasZ)
      .filter(_.exists(_ > NoData))
    def dims(i: Int): Array[Double] =
      Array(pts(i)._1, pts(i)._2) ++ zs.map(_(i)) ++ ms.map(_(i))
    val parts = (0 until numParts).map { p =>
      val from = partStarts(p)
      val until = if (p + 1 < numParts) partStarts(p + 1) else numPoints
      Array.tabulate(until - from)(i => dims(from + i))
    }
    if (wkbBase == 5) polyLineWkbNd(parts, zs.isDefined, ms.isDefined)
    else polygonWkbNd(parts, zs.isDefined, ms.isDefined)
  }

  /** Read a [range(16) + n×8 values] block if `expected` and the record is
    * long enough (the M block is optional even for Z/M shape types). */
  private def readValueBlock(c: ByteBuffer, contentLen: Int, off: Int, n: Int,
      expected: Boolean): Option[Array[Double]] =
    if (expected && off + 16 + 8 * n <= contentLen)
      Some(Array.tabulate(n)(i => c.getDouble(off + 16 + 8 * i)))
    else None

  // ------------------------------------------------------------ WKB writers

  /** ISO WKB geometry-type code: base + 1000 for Z, + 2000 for M, + 3000 ZM. */
  private def wkbType(base: Int, hasZ: Boolean, hasM: Boolean): Int =
    base + ((hasZ, hasM) match {
      case (true, true)   => 3000
      case (true, false)  => 1000
      case (false, true)  => 2000
      case (false, false) => 0
    })

  private def coordsWkb(base: Int, hasZ: Boolean, hasM: Boolean, nDoubles: Int)(
      write: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + 8 * nDoubles).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte) // little-endian marker
    b.putInt(wkbType(base, hasZ, hasM))
    write(b)
    b.array()
  }

  /** Standard little-endian WKB for POINT(x y). */
  def pointWkb(x: Double, y: Double): Array[Byte] =
    coordsWkb(1, hasZ = false, hasM = false, 2) { b => b.putDouble(x); b.putDouble(y) }

  /** ESRI MultiPoint → WKB MultiPoint (type 4): each member a full nested
    * WKB Point with its own byte-order mark — the shp2pgsql mapping
    * (operators/shp2pgsql.py:15-26 loads every geometry class). */
  def multiPointWkb(pts: Seq[(Double, Double)]): Array[Byte] =
    multiPointWkbNd(pts, None, None)

  private def multiPointWkbNd(pts: Seq[(Double, Double)], zs: Option[Array[Double]],
      ms: Option[Array[Double]]): Array[Byte] = {
    val dim = 2 + zs.size + ms.size
    val b = ByteBuffer.allocate(9 + (5 + 8 * dim) * pts.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(wkbType(4, zs.isDefined, ms.isDefined)); b.putInt(pts.length)
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      b.put(1.toByte); b.putInt(wkbType(1, zs.isDefined, ms.isDefined))
      b.putDouble(x); b.putDouble(y)
      zs.foreach(a => b.putDouble(a(i))); ms.foreach(a => b.putDouble(a(i)))
    }
    b.array()
  }

  private def putLinearRing(b: ByteBuffer, pts: Array[Array[Double]]): Unit = {
    b.putInt(pts.length)
    pts.foreach(_.foreach(b.putDouble))
  }

  private def ringBytes(pts: Array[Array[Double]]): Int =
    4 + pts.map(_.length * 8).sum

  /** ESRI PolyLine → WKB MultiLineString (type 5): one LineString per part —
    * the shp2pgsql mapping for linework. */
  def polyLineWkb(parts: Seq[Array[(Double, Double)]]): Array[Byte] =
    polyLineWkbNd(parts.map(_.map(p => Array(p._1, p._2))), hasZ = false, hasM = false)

  private def polyLineWkbNd(parts: Seq[Array[Array[Double]]], hasZ: Boolean,
      hasM: Boolean): Array[Byte] = {
    val size = 9 + parts.map(p => 5 + ringBytes(p)).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(wkbType(5, hasZ, hasM)); b.putInt(parts.length)
    parts.foreach { p =>
      b.put(1.toByte); b.putInt(wkbType(2, hasZ, hasM)) // nested LineString
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
  def polygonWkb(parts: Seq[Array[(Double, Double)]]): Array[Byte] =
    polygonWkbNd(parts.map(_.map(p => Array(p._1, p._2))), hasZ = false, hasM = false)

  private def polygonWkbNd(parts: Seq[Array[Array[Double]]], hasZ: Boolean,
      hasM: Boolean): Array[Byte] = {
    def signedArea2(p: Array[Array[Double]]): Double =
      p.indices.map { i =>
        val a = p(i); val c = p((i + 1) % p.length)
        a(0) * c(1) - c(0) * a(1)
      }.sum
    val polys = Seq.newBuilder[Seq[Array[Array[Double]]]]
    var current: List[Array[Array[Double]]] = Nil
    parts.foreach { ring =>
      val isOuter = signedArea2(ring) <= 0 // CW in ESRI convention
      if (isOuter && current.nonEmpty) { polys += current.reverse; current = Nil }
      current = ring :: current
    }
    if (current.nonEmpty) polys += current.reverse
    val ps = polys.result()
    val size = 9 + ps.map(rings => 9 + rings.map(ringBytes).sum).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.putInt(wkbType(6, hasZ, hasM)); b.putInt(ps.length)
    ps.foreach { rings =>
      b.put(1.toByte); b.putInt(wkbType(3, hasZ, hasM)); b.putInt(rings.length)
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

  /** Mint a tiny synthetic Point `.shp` with record-number-derived
    * coordinates — the fixture counterpart of `Multimodal.syntheticBmp`:
    * record i (1-based per the spec) holds Point((i % 4)·0.5, (i % 5)·0.25),
    * so an external oracle can state every record's exact WKB hex from i
    * alone (the chosen quarters have closed-form IEEE-754 bit patterns).
    * Layout per the ESRI spec: 100-byte header (BE file code 9994, BE file
    * length in 16-bit words, LE version/shape type/bbox), then per record a
    * BE [number, content words] header + LE Point content. */
  def syntheticPointShp(path: java.nio.file.Path, n: Int): Unit = {
    require(n > 0, s"need at least one record, got $n")
    val recBytes = 8 + 20 // record header + (int type, double x, double y)
    val fileLen = 100 + n * recBytes
    val buf = ByteBuffer.allocate(fileLen)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, fileLen / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, 1000) // version
    buf.putInt(32, 1) // Point
    val xs = (1 to n).map(i => (i % 4) * 0.5)
    val ys = (1 to n).map(i => (i % 5) * 0.25)
    buf.putDouble(36, xs.min); buf.putDouble(44, ys.min)
    buf.putDouble(52, xs.max); buf.putDouble(60, ys.max)
    var off = 100
    for (i <- 1 to n) {
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(off, i)
      buf.putInt(off + 4, 10) // content length: 20 bytes = 10 words
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(off + 8, 1)
      buf.putDouble(off + 12, xs(i - 1))
      buf.putDouble(off + 20, ys(i - 1))
      off += recBytes
    }
    Files.write(path, buf.array())
  }

  /** Mint a synthetic Polygon `.shp` of `n` records, each an 80×80 outer
    * square with a 40×40 HOLE — the geofence fixture for the S3 → X95
    * bridge (WKB decode → ring containment). Record i (1-based) sits at
    * (cx, cy) = ((i mod 4)·100, (i mod 3)·100): integral coordinates, so
    * the decoded integer rings are exact at scale 1 and an external
    * oracle states containment in closed form from i alone (axis-aligned
    * parity reduces to half-open boxes — the q246 argument — so inside ⇔
    * in the outer box AND NOT in the hole box). Rings follow the ESRI
    * packing convention the reader's WKB writer groups by: outer
    * clockwise (negative shoelace), hole counter-clockwise, both closed
    * (first vertex repeated last). */
  def syntheticPolygonShp(path: java.nio.file.Path, n: Int): Unit = {
    require(n > 0, s"need at least one record, got $n")
    // content: type(4) + bbox(32) + numParts(4) + numPoints(4) +
    // partStarts(2×4) + 10 points × 16 = 212 bytes = 106 words
    val contentBytes = 212
    val recBytes = 8 + contentBytes
    val fileLen = 100 + n * recBytes
    val buf = ByteBuffer.allocate(fileLen)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, fileLen / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, 1000) // version
    buf.putInt(32, 5) // Polygon
    def cx(i: Int) = (i % 4) * 100.0
    def cy(i: Int) = (i % 3) * 100.0
    buf.putDouble(36, (1 to n).map(cx).min)
    buf.putDouble(44, (1 to n).map(cy).min)
    buf.putDouble(52, (1 to n).map(cx(_) + 80.0).max)
    buf.putDouble(60, (1 to n).map(cy(_) + 80.0).max)
    var off = 100
    for (i <- 1 to n) {
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(off, i)
      buf.putInt(off + 4, contentBytes / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val x0 = cx(i); val y0 = cy(i)
      buf.putInt(off + 8, 5) // shape type
      buf.putDouble(off + 12, x0); buf.putDouble(off + 20, y0)
      buf.putDouble(off + 28, x0 + 80.0); buf.putDouble(off + 36, y0 + 80.0)
      buf.putInt(off + 44, 2) // numParts
      buf.putInt(off + 48, 10) // numPoints
      buf.putInt(off + 52, 0) // part 0 (outer) starts at point 0
      buf.putInt(off + 56, 5) // part 1 (hole) starts at point 5
      // outer ring, clockwise, closed
      val outer = Seq((x0, y0), (x0, y0 + 80.0), (x0 + 80.0, y0 + 80.0),
        (x0 + 80.0, y0), (x0, y0))
      // hole ring, counter-clockwise, closed
      val hole = Seq((x0 + 20.0, y0 + 20.0), (x0 + 60.0, y0 + 20.0),
        (x0 + 60.0, y0 + 60.0), (x0 + 20.0, y0 + 60.0), (x0 + 20.0, y0 + 20.0))
      (outer ++ hole).zipWithIndex.foreach { case ((x, y), j) =>
        buf.putDouble(off + 60 + 16 * j, x)
        buf.putDouble(off + 68 + 16 * j, y)
      }
      off += recBytes
    }
    Files.write(path, buf.array())
  }
}
