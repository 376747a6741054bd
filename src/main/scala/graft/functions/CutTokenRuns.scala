package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[CutTokenRuns]] — a plain object so generated Java
  * calls the static forwarder `graft.functions.CutUtil.cut(...)` (the
  * [[BpeUtil]] pattern). */
object CutUtil {

  /** Remove the tokens at `covered` indices from `text`, preserving every
    * byte OUTSIDE the cuts. Tokens are maximal runs of non-whitespace under
    * EXACTLY [[BpeUtil.isSpace]]'s separator set (the RE2 `\s` chars) — the
    * same set the producing plan splits on, so index i here is index i
    * there; a Java-`\s` tokenizer would additionally split on \x0B and
    * shift every index after it.
    *
    * Cut geometry, per maximal run of covered indices [i..j]:
    *   - interior/prefix run (a token follows): cut [start(i), start(j+1))
    *     — the run's tokens, their interior separators, and the run's
    *     TRAILING separator; the separator before the run survives.
    *   - suffix run with a predecessor: cut [end(i−1), end-of-text) — the
    *     separator BEFORE the run is consumed instead (there is no trailing
    *     separator to give up, and leaving both flanks would strand one).
    *   - whole-text run: cut [start(0), end-of-text); any leading
    *     whitespace survives (nothing kept follows it to anchor a cut).
    * Kept text is the byte-exact concatenation of the uncut segments —
    * separators between kept neighbours are whatever bytes the original
    * had, never re-synthesized.
    *
    * Out-of-range and duplicate indices in `covered` are ignored (the
    * producing plan sends a distinct in-range set; tolerating stragglers
    * here beats corrupting text on a bad caller). */
  def cut(u: UTF8String, covered: ArrayData): UTF8String = {
    val nCov = covered.numElements()
    if (nCov == 0) return u
    val s = u.toString
    val len = s.length
    // token boundaries under the RE2 \s set
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && BpeUtil.isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val b = i
        while (i < len && !BpeUtil.isSpace(s.charAt(i))) i += 1
        starts.add(b); ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok == 0) return u
    val cov = new Array[Boolean](nTok)
    var any = false
    var c = 0
    while (c < nCov) {
      val v = covered.getInt(c)
      if (v >= 0 && v < nTok) { cov(v) = true; any = true }
      c += 1
    }
    if (!any) return u
    val sb = new java.lang.StringBuilder(len)
    var pos = 0 // next uncopied char
    var t = 0
    while (t < nTok) {
      if (cov(t)) {
        var j = t
        while (j + 1 < nTok && cov(j + 1)) j += 1
        val from =
          if (j + 1 < nTok) starts.get(t).intValue()
          else if (t > 0) ends.get(t - 1).intValue()
          else starts.get(t).intValue()
        val to = if (j + 1 < nTok) starts.get(j + 1).intValue() else len
        sb.append(s, pos, from)
        pos = to
        t = j + 1
      } else t += 1
    }
    sb.append(s, pos, len)
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression: cut the tokens at the given indices out of a
  * text column, byte-preserving everything else — the rebuild step of
  * [[graft.dedup.Dedup.removeDuplicateSpans]] (exact substring REMOVAL).
  *
  * An Expression rather than a rebuild via `array_join(filter(tokens...))`:
  * the join form re-synthesizes separators (every tab/newline/multi-space
  * collapses to one space), destroying the "untouched text is byte-
  * identical" contract that makes span removal safe to run on real corpora.
  * Null in either child → null; callers coalesce the cover array to empty
  * for "no cuts" rows ([[CutUtil.cut]] short-circuits on empty).
  */
case class CutTokenRuns(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "cut_token_runs"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cut_token_runs expects (string, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, covered: Any): Any =
    CutUtil.cut(text.asInstanceOf[UTF8String], covered.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.CutUtil.cut($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutTokenRuns =
    copy(left = newLeft, right = newRight)
}
