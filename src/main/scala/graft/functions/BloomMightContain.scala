package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a long key against a
  * pre-built `org.apache.spark.util.sketch.BloomFilter` (Spark's public
  * sketch, the one `DataFrameStatFunctions.bloomFilter` builds).
  *
  * The filter rides as a foldable BINARY child (its serialized form), is
  * deserialized ONCE lazily per JVM-deserialized expression instance — not
  * per row — and probes stay inside whole-stage codegen via a reference
  * object, exactly how Spark's internal runtime-filter probe works. A
  * "false" answer is definitive (the key was never inserted); "true" may be
  * a false positive at the filter's configured fpp — callers needing
  * exactness confirm positives with an exact join (see
  * `Dedup.incrementalDedup`, which restores exact semantics while only the
  * tiny might-contain subset pays the join).
  *
  * Null key → null (standard SQL semantics). The filter child must be a
  * non-null foldable binary (enforced at analysis, not at runtime).
  */
case class BloomMightContain(value: Expression, filterExpr: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = value
  override def right: Expression = filterExpr

  override def nullable: Boolean = value.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain key must be BIGINT (hash the key columns with " +
          s"xxhash64 upstream), got ${value.dataType.simpleString}")
    else if (filterExpr.dataType != BinaryType || !filterExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter must be a foldable BINARY literal " +
          "(BloomFilter.writeTo bytes)")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom filter bytes must not be null")
    BloomFilter.readFrom(bytes)
  }

  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the DESERIALIZED filter is the codegen reference — probes in generated
    // code never touch the serialized bytes again
    val bloomRef = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    val valueGen = value.genCode(ctx)
    ev.copy(code = code"""
      ${valueGen.code}
      boolean ${ev.isNull} = ${valueGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $bloomRef.mightContainLong(${valueGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(value = newLeft, filterExpr = newRight)
}
