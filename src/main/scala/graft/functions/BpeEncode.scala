package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A compiled BPE merge table: ranked pair → merged-symbol lookup, built once
  * per expression instance and shared by the whole task (it rides the
  * expression's closure to executors once per task-set, like the Bloom filter
  * in [[BloomMightContain]] — never per row, never through the plan string).
  *
  * The table must be MONOTONE — each merge's operands are single characters
  * or the output of an EARLIER merge (the invariant every trained BPE vocab
  * satisfies by construction, since a pair can only be counted after its
  * operands exist). Monotonicity is what makes the two standard encode
  * formulations provably identical: "repeatedly merge the lowest-rank pair
  * present, leftmost first" (implemented here — per-word cost depends on
  * word length, NOT vocab size, the right dependence for a 50k-merge vocab)
  * and "one left-to-right pass per rank in order" (the chained-`replace`
  * semantics an external engine can replay, which is how the DuckDB oracle
  * verifies this expression). Merging rank m can only create pairs involving
  * the new symbol, and any table pair containing that symbol has rank > m by
  * monotonicity — so no merge ever creates work at an already-passed rank.
  */
final class BpeTable(val merges: Seq[(String, String)]) extends Serializable {
  require(merges.forall { case (l, r) =>
    l.nonEmpty && r.nonEmpty && !l.exists(BpeUtil.isSpace) && !r.exists(BpeUtil.isSpace)
  }, "BPE merge operands must not contain the encoder's separator chars " +
    "(pre-tokenization splits on them, so no symbol can contain one). " +
    "The check uses EXACTLY BpeUtil.isSpace's set — a broader test like " +
    "Character.isWhitespace would reject operands containing U+2028 etc., " +
    "which the encoder (and a corpus-trained table) legitimately treats as " +
    "word characters")
  require(merges.forall { case (l, r) =>
    !l.contains('\u0000') && !r.contains('\u0000')
  }, "BPE merge operands must not contain NUL (the rank-map joiner) — " +
    "checked HERE so an invalid table fails at construction, not at first " +
    "row evaluation on an executor")
  locally {
    val known = scala.collection.mutable.Set[String]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // "single character" means one CODEPOINT — the unit the encoder's
      // word split produces (a lone UTF-16 surrogate can never be a symbol)
      require(l.codePointCount(0, l.length) == 1 || known.contains(l),
        s"merge $i ($l,$r): left operand '$l' is neither a single character " +
          "nor the output of an earlier merge — the table must be monotone")
      require(r.codePointCount(0, r.length) == 1 || known.contains(r),
        s"merge $i ($l,$r): right operand '$r' is neither a single character " +
          "nor the output of an earlier merge — the table must be monotone")
      // No symbol may be produced twice — neither by a repeated (left,right)
      // pair (the rank map would silently keep only the LAST rank) nor by
      // two distinct merges concatenating to the same output (a later
      // re-creation of the symbol could resurrect a pair at an already-
      // passed lower rank). Either shape breaks the replace-pass ⇔
      // priority-encode equivalence the oracle replay relies on; trained
      // tables never produce them, so reject the caller-supplied ones here
      // instead of assuming the precondition.
      require(known.add(l + r),
        s"merge $i ($l,$r): output symbol '${l + r}' is already produced by " +
          "an earlier merge (duplicate pair or colliding concatenation) — " +
          "each symbol must have exactly one derivation for encode to be " +
          "equivalent to ordered replace passes")
    }
  }

  /** (left + NUL + right) → rank. The NUL joiner cannot collide:
    * symbols are whitespace-free but may contain any other char EXCEPT NUL
    * (checked), so the key is injective over pairs. */
  @transient lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + '\u0000' + r, Int.box(i))
    }
    m
  }
  /** rank → operands/merged symbol as arrays: the hot loop indexes per
    * sweep, and a List-backed `merges(i)` would be O(rank) per access. */
  @transient lazy val lefts: Array[String] = merges.map(_._1).toArray
  @transient lazy val rights: Array[String] = merges.map(_._2).toArray
  @transient lazy val merged: Array[String] =
    merges.map { case (l, r) => l + r }.toArray

  override def equals(o: Any): Boolean = o match {
    case b: BpeTable => b.merges == merges
    case _ => false
  }
  override def hashCode(): Int = merges.hashCode()
  override def toString: String = s"BpeTable(${merges.size} merges)"
}

/** Runtime helper for [[BpeEncode]] — a plain object so generated Java calls
  * the static forwarder `graft.functions.BpeUtil.encode(...)`. */
object BpeUtil {

  // The RE2 \s set — space, \t, \n, \f, \r — because the DuckDB oracle
  // replays tokenization with RE2's \s, and the engine must agree with the
  // oracle on every byte. Deliberately NOT Java's \s (which adds \x0B) and
  // NOT Character.isWhitespace (which adds Unicode separators): the q111
  // oracle would count a \x0B as a token character while a Java-\s split
  // treats it as a separator.
  @inline private[graft] def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** The same set as a regex character class, for plan-side splits that
    * must segment exactly like the encoder ([[graft.text.BpeTrain]]). */
  private[graft] val spaceClass: String = "[ \\t\\n\\f\\r]"

  /** Encode one string: split on runs of whitespace (whitespace is never a
    * token and merges never cross it), then BPE-merge each word from its
    * character split. Returns the concatenated per-word token arrays in
    * order — so `size(...)` is the corpus-budget token count. */
  def encode(u: UTF8String, table: BpeTable): GenericArrayData = {
    val s = u.toString
    val out = new java.util.ArrayList[UTF8String]()
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        var j = i
        while (j < n && !isSpace(s.charAt(j))) j += 1
        encodeWord(s, i, j, table, out)
        i = j
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Greedy lowest-rank-first merge of one word (s[start,end)).
    * Each round finds the minimum-rank adjacent pair present, then merges
    * ALL its occurrences left-to-right non-overlapping in one sweep (safe:
    * by monotonicity that rank cannot reappear — see [[BpeTable]]). At most
    * len-1 merges happen in total and each sweep performs at least one, so
    * the word costs O(len · sweeps) ≤ O(len²) rank lookups worst-case —
    * bounded by WORD length, independent of vocabulary size. */
  private def encodeWord(s: String, start: Int, end: Int, table: BpeTable,
      out: java.util.ArrayList[UTF8String]): Unit = {
    // initial symbols are CODEPOINTS, not UTF-16 code units: splitting a
    // surrogate pair (emoji — routine in the web text this targets) would
    // make lone-surrogate symbols that UTF8String mangles to '?' bytes,
    // breaking the concatenation-restores-text invariant and disagreeing
    // with the oracle's codepoint-based counts
    val syms = new Array[String](end - start) // upper bound (BMP-only word)
    var len = 0
    var ci = start
    while (ci < end) {
      val cp = s.codePointAt(ci)
      syms(len) = new String(Character.toChars(cp))
      len += 1
      ci += Character.charCount(cp)
    }
    val rank = table.rank
    var continue = len > 1
    while (continue) {
      // find the lowest-rank pair present
      var best = Int.MaxValue
      var p = 0
      while (p < len - 1) {
        val r = rank.get(syms(p) + '\u0000' + syms(p + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        p += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        // merge every occurrence of the best pair, leftmost-first,
        // non-overlapping (identical to one replace() pass at this rank)
        val l = table.lefts(best)
        val r = table.rights(best)
        val m = table.merged(best)
        var read = 0
        var write = 0
        while (read < len) {
          if (read + 1 < len && syms(read) == l && syms(read + 1) == r) {
            syms(write) = m
            read += 2
          } else {
            syms(write) = syms(read)
            read += 1
          }
          write += 1
        }
        len = write
        continue = len > 1
      }
    }
    var k = 0
    while (k < len) { out.add(UTF8String.fromString(syms(k))); k += 1 }
  }
}

/** Native Catalyst expression: byte-pair-encoding tokenization of a string
  * column against a fixed merge table — `array<string>` of subword tokens.
  * Token COUNTS are the point (`size(bpe_tokens(...))`): training-data
  * curation budgets in tokenizer tokens, and whitespace proxies drift 3–5×
  * from BPE reality on web text, mis-spending the token budget the pipeline
  * exists to manage.
  *
  * Semantics: pre-tokenize on whitespace runs (regex-`\s` set), start each
  * word from its character split, repeatedly merge the lowest-rank adjacent
  * pair (leftmost-first within a rank). The merge table must be monotone
  * ([[BpeTable]]), which makes this provably equal to applying the merges
  * as ordered left-to-right `replace` passes — the property that lets an
  * external SQL engine verify the encode exactly.
  *
  * An Expression (with codegen) rather than a UDF: no closure serialization
  * per operator, no per-row encoder round-trip, and the compiled rank map
  * rides the expression to executors once per task-set. Per-row cost is
  * O(word² ) worst-case in word LENGTH but independent of vocab SIZE — the
  * dependence that survives a 50k-merge production vocabulary.
  * Null in → null out. */
case class BpeEncode(child: Expression, table: BpeTable) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeUtil.encode(input.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtil.encode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Serialize a merge table for the SQL face: one merge per newline,
    * operands separated by a single space (symbols are whitespace-free, so
    * both separators are collision-proof). */
  def encodeMerges(merges: Seq[(String, String)]): String =
    merges.map { case (l, r) => s"$l $r" }.mkString("\n")

  /** Registry builder: `bpe_tokens(text, mergesLiteral)` with the merge
    * table as a foldable string literal, compiled once at resolution. */
  private[functions] def fromArgs(es: Seq[Expression]): BpeEncode = {
    require(es.length == 2, s"bpe_tokens takes 2 arguments, got ${es.length}")
    val mergesExpr = es(1)
    require(mergesExpr.foldable && mergesExpr.dataType.isInstanceOf[StringType],
      "bpe_tokens merge table must be a foldable STRING literal " +
        "(one 'left right' pair per line; see BpeEncode.encodeMerges)")
    val raw = mergesExpr.eval(null)
    require(raw != null, "bpe_tokens merge table must not be null")
    val merges = raw.toString.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val parts = line.split(" ")
      require(parts.length == 2,
        s"malformed merge line '$line' — expected 'left right'")
      (parts(0), parts(1))
    }
    BpeEncode(es(0), new BpeTable(merges))
  }
}
