package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextStats

class BpeSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val merges: Seq[(String, String)] =
    Seq("t" -> "h", "th" -> "e", "a" -> "t", "s" -> "c", "sc" -> "a", "sca" -> "n")

  private def encode(text: String, m: Seq[(String, String)] = merges): Seq[String] =
    Seq(text).toDF("text")
      .select(TextStats.bpeTokens(col("text"), m).as("t"))
      .as[Seq[String]].head()

  test("empty merge table degrades to the per-word character split") {
    assert(encode("the scan", Nil) == Seq("t", "h", "e", "s", "c", "a", "n"))
    // the provable oracle point: count == non-whitespace char count
    assert(encode("ab  cd\n e", Nil).size == 5)
  }

  test("multi-level merge chains apply in rank order") {
    assert(encode("the") == Seq("the"))
    assert(encode("scan") == Seq("scan"))
    assert(encode("batch") == Seq("b", "at", "c", "h"))
    assert(encode("data") == Seq("d", "at", "a"))
  }

  test("lowest rank wins when pairs compete inside one word") {
    // pairs present in "scat": (s,c) rank 3 and (a,t) rank 2 — (a,t) merges
    // first, then (s,c) still applies: NOT the sc→sca chain
    assert(encode("scat") == Seq("sc", "at"))
  }

  test("within a rank, occurrences merge leftmost-first non-overlapping") {
    val m = Seq("a" -> "a")
    assert(encode("aaa", m) == Seq("aa", "a"))
    assert(encode("aaaa", m) == Seq("aa", "aa"))
  }

  test("merges never cross whitespace; concatenation restores the text") {
    assert(encode("t h") == Seq("t", "h")) // 'th' only merges WITHIN a word
    val text = "the batch scan data sorts fast"
    assert(encode(text).mkString == text.replaceAll("\\s", ""))
  }

  test("duplicate pairs and colliding outputs are rejected at construction") {
    // same (left,right) twice: the rank map would keep only the last rank
    intercept[Exception] { new BpeTable(Seq("a" -> "b", "a" -> "b")) }
    // distinct merges concatenating to the same symbol: ("a","bc") and
    // ("ab","c") both produce "abc" — the second could resurrect pairs at
    // an already-passed rank, breaking the replace-pass equivalence
    intercept[Exception] {
      new BpeTable(Seq("b" -> "c", "a" -> "b", "a" -> "bc", "ab" -> "c"))
    }
    // distinct outputs stay legal
    new BpeTable(Seq("a" -> "b", "b" -> "c", "ab" -> "c"))
  }

  test("non-monotone tables are rejected; null text counts as zero") {
    // ("th","e") before ("t","h"): operand 'th' not yet produced
    intercept[Exception] {
      encode("the", Seq("th" -> "e", "t" -> "h"))
    }
    val got = Seq((1L, Option.empty[String]), (2L, Some("the")))
      .toDF("id", "text")
      .select(col("id"), TextStats.bpeTokenCount(col("text"), merges).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1))
  }

  test("ByCount rewiring: budget selection spends the supplied counts") {
    val docs = Seq(
      (1L, "the the the", 3.0), // 3 bpe tokens, best score
      (2L, "scan", 2.0),        // 1 bpe token
      (3L, "batch", 1.0)        // 4 bpe tokens — overflows budget 5
    ).toDF("doc_id", "text", "score")
    val got = TextStats.selectUnderTokenBudgetByCount(docs, "doc_id",
        TextStats.bpeTokenCount(col("text"), merges), col("score"), budget = 5L)
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 3L, 3L), (2L, 1L, 4L)))
    // the whitespace-proxy path would have spent 3+1+1 and kept doc 3 too —
    // exactly the budget mis-spend the BPE rewiring fixes
    val ws = TextStats.selectUnderTokenBudget(docs, "doc_id", col("text"),
      col("score"), budget = 5L)
    assert(ws.count() == 3)
  }

  test("packSequencesByCount bins by the supplied counts in id order") {
    val docs = Seq((1L, "aaaa aaaa"), (2L, "aaaa"), (3L, "aa")).toDF("id", "text")
    // (a,a) merges: doc1 → 4 tokens, doc2 → 2, doc3 → 1; bins of 4:
    // cum 4→bin 0, cum 6→bin 1, cum 7→bin 1
    val got = TextStats.packSequencesByCount(docs, "id",
        TextStats.bpeTokenCount(col("text"), Seq("a" -> "a")), maxTokens = 4L)
      .select("id", "n_tokens", "bin").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 4L, 0L), (2L, 2L, 1L), (3L, 1L, 1L)))
  }

  test("only the encoder's separator set is reserved — U+2028 is a word char") {
    // Character.isWhitespace(U+2028) is true, but the encoder splits only
    // on the RE2 \s set, so a corpus-trained table may legitimately carry
    // U+2028 inside operands — BpeTable must accept it, and training must
    // segment exactly like the encoder
    val sep = " "
    assert(encode(s"a${sep}b", Nil) == Seq("a", sep, "b"))
    assert(encode(s"a${sep}b", Seq("a" -> sep, s"a$sep" -> "b")) ==
      Seq(s"a${sep}b"))
    val docs = Seq(s"a${sep}b a${sep}b").toDF("text")
    val learned = graft.text.BpeTrain.train(docs, col("text"), 2)
    assert(learned == Seq("a" -> sep, s"a$sep" -> "b"))
  }

  test("non-BMP codepoints stay whole symbols (no surrogate splitting)") {
    val emoji = new String(Character.toChars(0x1F600)) // 😀, outside the BMP
    // a per-code-unit split would make lone surrogates that UTF8String
    // mangles to '?' — the codepoint split keeps the emoji intact
    assert(encode(emoji + emoji, Nil) == Seq(emoji, emoji))
    // a single non-BMP codepoint is a valid merge operand (codePointCount,
    // not String.length, decides "single character")
    assert(encode(emoji + emoji, Seq(emoji -> emoji)) == Seq(emoji + emoji))
    // and the count matches the oracle's codepoint-based len()
    assert(encode("a" + emoji + "b", Nil) == Seq("a", emoji, "b"))
  }

  test("SQL face parses the merge literal and matches the DataFrame face") {
    val df = Seq("the scan batch").toDF("text")
    df.createOrReplaceTempView("bpe_sql_face")
    val lit = BpeEncode.encodeMerges(merges).replace("\n", "\\n")
    val viaSql = spark.sql(
      s"SELECT bpe_tokens(text, '$lit') AS t FROM bpe_sql_face")
      .as[Seq[String]].head()
    assert(viaSql == Seq("the", "scan", "b", "at", "c", "h"))
  }
}
