package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a long key against a
  * pre-built `org.apache.spark.util.sketch.BloomFilter` (Spark's public
  * sketch, the one `DataFrameStatFunctions.bloomFilter` builds).
  *
  * The filter is a CONSTRUCTOR parameter, not an expression child: a child
  * binary literal would embed the filter's full serialized form — easily
  * hundreds of MB at 10^9 keys — into every plan `toString`/`explain`,
  * which must stay O(expression) however big the sketch is. The filter
  * object serializes with the expression to executors once per task-set
  * (it is `java.io.Serializable`), and probes stay inside whole-stage
  * codegen via a reference object.
  *
  * A "false" answer is definitive (the key was never inserted); "true" may
  * be a false positive at the filter's configured fpp — callers needing
  * exactness confirm positives with an exact join (see
  * `Dedup.incrementalDedup`, which restores exact semantics while only the
  * tiny might-contain subset pays the join). Null key → null.
  *
  * SQL face (`bloom_might_contain(key, filterBytes)`): the binary argument
  * must be a foldable literal; the registry builder deserializes it ONCE at
  * resolution and drops the bytes from the tree.
  */
case class BloomMightContain(value: Expression, filter: BloomFilter)
    extends UnaryExpression with Predicate {

  override def child: Expression = value

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain key must be BIGINT (hash the key columns with " +
        s"xxhash64 upstream), got ${value.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bloomRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(value = newChild)
}

object BloomMightContain {
  /** Registry builder: `bloom_might_contain(key, filterBytes)` with the
    * bytes as a foldable binary literal, deserialized once at resolution. */
  private[functions] def fromArgs(es: Seq[Expression]): BloomMightContain = {
    require(es.length == 2, s"bloom_might_contain takes 2 arguments, got ${es.length}")
    val filterExpr = es(1)
    require(filterExpr.foldable &&
      filterExpr.dataType == org.apache.spark.sql.types.BinaryType,
      "bloom_might_contain filter must be a foldable BINARY literal " +
        "(BloomFilter.writeTo bytes)")
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom filter bytes must not be null")
    BloomMightContain(es(0), BloomFilter.readFrom(bytes))
  }
}
