package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Runtime helper for [[WkbRings]] — a plain object so the generated Java
  * calls the static forwarder `graft.functions.WkbRingsUtil.rings(...)`. */
object WkbRingsUtil {

  /** Decode a WKB Polygon (type 3) or MultiPolygon (type 6) into the X95
    * ring form `array<array<struct<x:long,y:long>>>`: every ring of every
    * member polygon, coordinates scaled by `scale` and rounded to Long,
    * the explicit WKB closing vertex DROPPED (the [[graft.ops.Spatial]]
    * walk closes rings implicitly — keeping it would double-count the
    * first vertex's edges). Both byte orders accepted per geometry (each
    * nested polygon carries its own mark, the standard). Anything else —
    * other geometry classes, Z/M dimensions (their per-point stride
    * differs), truncated buffers — returns NULL: decode degrades, never
    * throws, the [[graft.ingest.Shapefile]] stance. */
  def rings(wkb: Array[Byte], scale: Long): ArrayData = {
    try {
      val buf = ByteBuffer.wrap(wkb)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      parseGeom(buf, out, scale, nested = false)
      if (buf.hasRemaining) return null // trailing bytes: not a clean WKB
      new GenericArrayData(out.toArray)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def parseGeom(buf: ByteBuffer, out: scala.collection.mutable.ArrayBuffer[Any],
      scale: Long, nested: Boolean): Unit = {
    buf.order(if (buf.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.getInt() match {
      case 3 => // Polygon: numRings × [numPoints × (x, y)]
        val nr = buf.getInt()
        var r = 0
        while (r < nr) { out += readRing(buf, scale); r += 1 }
      case 6 if !nested => // MultiPolygon: numPolys × full nested WKBPolygon
        val np = buf.getInt()
        var p = 0
        while (p < np) { parseGeom(buf, out, scale, nested = true); p += 1 }
      case _ => throw new IllegalArgumentException("unsupported WKB type")
    }
  }

  private def readRing(buf: ByteBuffer, scale: Long): ArrayData = {
    val n = buf.getInt()
    require(n >= 0 && n <= buf.remaining() / 16, "ring point count overruns buffer")
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      xs(i) = Math.round(buf.getDouble() * scale)
      ys(i) = Math.round(buf.getDouble() * scale)
      i += 1
    }
    // WKB rings repeat the first vertex as the last; drop it for the
    // implicitly-closed X95 contract (tolerate unclosed input as-is)
    val m = if (n >= 2 && xs(0) == xs(n - 1) && ys(0) == ys(n - 1)) n - 1 else n
    val rows = new Array[Any](m)
    i = 0
    while (i < m) { rows(i) = InternalRow(xs(i), ys(i)); i += 1 }
    new GenericArrayData(rows)
  }
}

/** Native Catalyst expression: WKB (Multi)Polygon → X95 integer rings —
  * the bridge from S3's shapefile ingestion (`Shapefile.read` lands
  * geometry as WKB, the PostGIS wire form the reference's shp2pgsql
  * produces, reference operators/shp2pgsql.py:11-27) to X95's containment
  * join (`Spatial.containsJoinRings` consumes `array<array<struct<x,y>>>`
  * rings). `scale` converts double degrees/meters to the exact integer
  * units the PNPOLY Long arithmetic requires (micro-degrees: 1e6).
  *
  * An Expression (with codegen) rather than a UDF for the usual reasons;
  * the decode is a single forward pass over the buffer, no allocation
  * beyond the output. Unsupported/malformed WKB → NULL (degrade, never
  * throw — one corrupt geometry must not kill a 100 TB tagging pass). */
case class WkbRings(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = WkbRings.outType
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_rings"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"wkb_rings expects (binary, long), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(wkb: Any, scale: Any): Any =
    WkbRingsUtil.rings(wkb.asInstanceOf[Array[Byte]],
      scale match { case i: Int => i.toLong; case l: Long => l })

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, s) => s"""
      ${ev.value} = graft.functions.WkbRingsUtil.rings($w, (long) $s);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WkbRings =
    copy(left = newLeft, right = newRight)
}

object WkbRings {
  /** `array<array<struct<x:long,y:long>>>` — exactly what
    * [[graft.ops.Spatial.pointInRings]] consumes. */
  val outType: DataType = ArrayType(ArrayType(StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false)))))
}
