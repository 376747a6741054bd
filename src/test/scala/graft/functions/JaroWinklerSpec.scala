package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** JaroWinkler: the published worked examples, the convention pins the
  * scaladoc states (byte-based, empty → 0, integer-halved transpositions,
  * boost only past 0.7), codegen/eval parity, and the fuzzyJoinJw
  * integration contract. Expected micros are DuckDB's
  * `round(jaro_winkler_similarity(a,b)·1e6)` — verified against the live
  * oracle engine when the comparator landed. */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerUtil.jwMicro(UTF8String.fromString(a), UTF8String.fromString(b))

  test("published worked examples (Winkler 1990 / the Census comparator)") {
    // MARTHA/MARHTA: jaro 17/18, prefix 3 -> 0.961111...
    assert(jw("MARTHA", "MARHTA") == 961111L)
    // DIXON/DICKSONX: jaro 0.766667, prefix 2 -> 0.813333...
    assert(jw("DIXON", "DICKSONX") == 813333L)
    // DWAYNE/DUANE: jaro 0.822222, prefix 1 -> 0.84
    assert(jw("DWAYNE", "DUANE") == 840000L)
    // JELLYFISH/SMELLYFISH: jaro 0.896296, no common prefix -> unchanged
    assert(jw("JELLYFISH", "SMELLYFISH") == 896296L)
  }

  test("the transposition case Levenshtein mis-ranks") {
    // MARHTA is one adjacent swap from MARTHA (lev 2) — same lev as the
    // 2-substitution corruption MARXXA, but JW separates them decisively
    assert(jw("MARTHA", "MARHTA") > jw("MARTHA", "MARXXA") + 100000L)
  }

  test("convention pins: empty, identical, disjoint, window, boost gate") {
    assert(jw("", "") == 0L) // DuckDB convention: empty -> 0, even both-empty
    assert(jw("abc", "") == 0L)
    assert(jw("", "abc") == 0L)
    assert(jw("abc", "abc") == 1000000L)
    assert(jw("a", "a") == 1000000L)
    assert(jw("abcde", "fghij") == 0L) // no matches
    assert(jw("ab", "ba") == 0L)       // window = max(2,2)/2-1 = 0
    // jaro exactly 0.7 with an 11-byte common prefix: boost fires only
    // ABOVE 0.7; (0.55+0.55+1)/3 computes to 0.70000000000000011 in IEEE
    // so the gate fires — pinned to DuckDB's observed 820000
    assert(jw("abcdefghijk111111111", "abcdefghijk222222222") == 820000L)
    // jaro 0.5 with a 2-byte prefix: no boost
    assert(jw("abcdefgh", "abijklmn") == 500000L)
  }

  test("transpositions use integer division (a 3-cycle counts 1)") {
    // matched sequences abcxxxx / bcaxxxx mismatch at 3 positions ->
    // t = 3/2 = 1 -> jaro (1 + 1 + 6/7)/3 = 0.952381 (DuckDB-verified)
    assert(jw("abcxxxx", "bcaxxxx") == 952381L)
  }

  test("byte-based, not codepoint-based (the DuckDB oracle's convention)") {
    // 'café'/'cafe': bytes 5 vs 4, m=3, prefix 3 -> 0.848333 (DuckDB);
    // the codepoint answer would differ
    assert(jw("café", "cafe") == 848333L)
    assert(jw("ééé", "éée") == 893333L)
  }

  test("expression: codegen and eval agree, null semantics, SQL surface") {
    GraftFunctions.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      (null: String, "x"), ("x", null: String))
      .toDF("a", "b")
    val got = df.select(GraftFunctions.jaroWinklerMicro(col("a"), col("b")))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(961111L), Some(813333L), None, None))
    // SQL name resolves and matches the Column API
    val sql = spark.sql(
      "SELECT jaro_winkler_micro('MARTHA', 'MARHTA')").head().getLong(0)
    assert(sql == 961111L)
    // interpreted (non-codegen) path agrees
    val expr = JaroWinkler(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("MARTHA"), org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("MARHTA"), org.apache.spark.sql.types.StringType))
    assert(expr.eval(null) == 961111L)
  }

  test("fuzzyJoinJw: lev AND jw verified, both scores emitted") {
    val reg = Seq(1L -> "MARTHA", 2L -> "MARHTA", 3L -> "MARXXA",
      4L -> "ZZZZZZ").toDF("id", "nm")
    val got = graft.ops.FuzzyJoin.fuzzyJoinJw(reg, "id", "nm",
        reg, "id", "nm", maxDist = 2, minJwMicro = 900000L)
      .filter(col("left_id") < col("right_id"))
      .as[(Long, Long, Int, Long)].collect().toSet
    // MARTHA~MARHTA survives (lev 2, jw 961111); MARTHA~MARXXA and
    // MARHTA~MARXXA are lev-candidates killed by the JW gate; ZZZZZZ
    // pairs with nothing; the dist-0 diagonal is filtered by id order
    assert(got == Set((1L, 2L, 2, 961111L)))
  }

  test("fuzzyJoinJw refuses an out-of-range threshold") {
    val df = Seq(1L -> "a").toDF("id", "nm")
    intercept[IllegalArgumentException] {
      graft.ops.FuzzyJoin.fuzzyJoinJw(df, "id", "nm", df, "id", "nm",
        maxDist = 1, minJwMicro = 2000000L)
    }
  }
}
