package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two numeric arrays in double precision — the
  * codegen'd hot loop behind PQ encode, ADC, and IVF cell assignment
  * ([[graft.sim.Quantize.dot]] routes here).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the HOF form
  * allocates a zipped intermediate array per row and evaluates its lambda
  * chain INTERPRETED (lambda-bearing trees are excluded from whole-stage
  * codegen), so the innermost loop of every vector operator paid per-
  * element closure dispatch. This compiles to a bare fused multiply-add
  * loop. The arithmetic is the identical left-to-right IEEE sum the HOF
  * fold performs (acc + x·y from 0.0), so swapping implementations is
  * bit-invisible to results and oracles (QuantizeSpec pins it).
  *
  * Null semantics mirror the HOF form exactly: null input → null; length
  * mismatch → null (zip_with pads with null and the products poison the
  * fold); any NULL ELEMENT → null (same poisoning). Mixed float/double
  * element types accepted per side, like [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case other => throw new IllegalArgumentException(
      s"dot_product expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _),
            ArrayType(DoubleType | FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<float|double> columns, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // nullable even when both children are non-null: length-mismatch and
  // null-element rows produce null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val xd = elemIsDouble(left)
    val yd = elemIsDouble(right)
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getX = if (elemIsDouble(left)) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
      val getY = if (elemIsDouble(right)) s"$y.getDouble($i)" else s"(double) $y.getFloat($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $x.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $getX * $getY;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
