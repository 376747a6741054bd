package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native Catalyst expressions.
  *
  * Two equivalent ways in:
  *  - `GraftFunctions.register(spark)` — idempotent per-session registration
  *    into the session's FunctionRegistry (works on any already-built session);
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — the standard
  *    `SparkSessionExtensions` injection path for cluster-wide deploys.
  *
  * After either, `cosine_sim(a, b)` is available to SQL and, via
  * [[GraftFunctions.cosineSim]], to the DataFrame API.
  */
object GraftFunctions {

  private[functions] val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
      (FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
        (es: Seq[Expression]) => NfcNormalize(es(0))),
      (FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
        (es: Seq[Expression]) => BloomMightContain.fromArgs(es)),
      (FunctionIdentifier("bpe_tokens"),
        new ExpressionInfo(classOf[BpeEncode].getName, "bpe_tokens"),
        (es: Seq[Expression]) => BpeEncode.fromArgs(es)),
      (FunctionIdentifier("cut_token_runs"),
        new ExpressionInfo(classOf[CutTokenRuns].getName, "cut_token_runs"),
        (es: Seq[Expression]) => CutTokenRuns(es(0), es(1))),
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (es: Seq[Expression]) => DotProduct(es(0), es(1))),
      (FunctionIdentifier("wkb_rings"),
        new ExpressionInfo(classOf[WkbRings].getName, "wkb_rings"),
        (es: Seq[Expression]) => WkbRings(es(0), es(1))),
      (FunctionIdentifier("jaro_winkler_micro"),
        new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler_micro"),
        (es: Seq[Expression]) => JaroWinkler(es(0), es(1))))

  /** Register all graft functions in this session (no-op if present). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }

  /** Cosine similarity of two `array<float>` columns in double precision —
    * the codegen'd [[CosineSimilarity]] expression. Requires [[register]]
    * (called lazily by graft query entry points). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Unicode NFC normalization — the codegen'd [[NfcNormalize]] expression.
    * Requires [[register]] (called lazily by graft query entry points). */
  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)

  /** Bloom membership probe of a BIGINT key column against a serialized
    * `org.apache.spark.util.sketch.BloomFilter` — the codegen'd
    * [[BloomMightContain]] expression. Requires [[register]]. */
  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    call_function("bloom_might_contain", key, org.apache.spark.sql.functions.lit(filterBytes))

  /** BPE subword tokenization against a monotone merge table — the
    * codegen'd [[BpeEncode]] expression ([[graft.text.TextStats.bpeTokens]]
    * is the usual entry). Requires [[register]]. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_tokens", text,
      org.apache.spark.sql.functions.lit(BpeEncode.encodeMerges(merges)))

  /** Byte-preserving removal of the tokens at `covered` indices — the
    * codegen'd [[CutTokenRuns]] expression, the rebuild step of exact
    * substring removal. Requires [[register]]. */
  def cutTokenRuns(text: Column, covered: Column): Column =
    call_function("cut_token_runs", text, covered)

  /** Double-precision dot product of two numeric array columns — the
    * codegen'd [[DotProduct]] expression (the PQ/IVF hot loop). Requires
    * [[register]]; [[graft.sim.Quantize.dot]] registers lazily against
    * the active session so the Column builders stay session-free. */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** WKB (Multi)Polygon → `array<array<struct<x:long,y:long>>>` integer
    * rings at `scale` units per input unit — the codegen'd [[WkbRings]]
    * expression bridging S3's WKB geometry to X95's containment join.
    * Requires [[register]]. */
  def wkbRings(wkb: Column, scale: Long): Column =
    call_function("wkb_rings", wkb, org.apache.spark.sql.functions.lit(scale))

  /** Jaro-Winkler similarity of two string columns in integer micros —
    * the codegen'd [[JaroWinkler]] expression (the record-linkage
    * comparator). Requires [[register]]. */
  def jaroWinklerMicro(a: Column, b: Column): Column =
    call_function("jaro_winkler_micro", a, b)
}

/** `spark.sql.extensions` entry point (cluster-wide function injection). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.fns.foreach(e.injectFunction)
}
