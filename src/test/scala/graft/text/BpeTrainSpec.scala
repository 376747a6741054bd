package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeTable

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("train learns hand-computable merges in frequency order") {
    // corpus: aaab ×2, ab ×1
    // iter0 pairs: (a,a)=4, (a,b)=3          → learn (a,a)
    // iter1: words [aa,a,b]×2 [a,b]: (aa,a)=2, (a,b)=3 → learn (a,b)
    // iter2: words [aa,ab]×2 [ab]: (aa,ab)=2 → learn (aa,ab)
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = BpeTrain.train(docs, col("text"), numMerges = 3)
    assert(merges == Seq("a" -> "a", "a" -> "b", "aa" -> "ab"))
    // learned tables are monotone by construction — encoder-ready
    new BpeTable(merges)
    // and the encoder replays training exactly: the whole word is 1 token
    val enc = Seq("aaab").toDF("text")
      .select(TextStats.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(enc == Seq("aaab"))
  }

  test("ties break lexicographically; count-1 pairs stop training") {
    // (a,b) and (c,d) both count 1 → nothing reaches the ≥2 floor
    assert(BpeTrain.train(Seq("ab cd").toDF("text"), col("text"), 5).isEmpty)
    // doubled, both count 2 → lexicographic order decides
    val m = BpeTrain.train(Seq("ab cd ab cd").toDF("text"), col("text"), 2)
    assert(m == Seq("a" -> "b", "c" -> "d"))
  }

  test("minCount prunes rare words; maxWords caps deterministically") {
    val docs = Seq("xx xx xx yz").toDF("text")
    // minCount=2 drops the singleton yz → only (x,x) remains
    assert(BpeTrain.train(docs, col("text"), 5, minCount = 2L) ==
      Seq("x" -> "x"))
    // maxWords=1 keeps only the most frequent word (xx)
    assert(BpeTrain.train(docs, col("text"), 5, maxWords = 1) ==
      Seq("x" -> "x"))
  }

  test("more merges never increase the encoded token count") {
    val docs = (1 to 50).map(i => s"alpha beta gamma${i % 3}").toDF("text")
    val counts = (0 to 6).map { k =>
      val merges = BpeTrain.train(docs, col("text"), k)
      docs.select(sum(TextStats.bpeTokenCount(col("text"), merges)).as("n"))
        .as[Long].head()
    }
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(counts.last < counts.head) // the merges actually compress
  }

  test("pairCounts weights by word frequency and drops tail pairs") {
    val got = BpeTrain.pairCounts(Seq("aaab aaab ab").toDF("text"), col("text"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a a" -> 4L, "a b" -> 3L))
  }

  test("training counts codepoints like pairCounts — no surrogate pairs") {
    val e = new String(Character.toChars(0x1F600)) // 😀 (two UTF-16 units)
    val docs = Seq(s"$e$e $e$e").toDF("text")
    // per-code-unit counting would see 3 surrogate-half pairs per word and
    // learn a lone-surrogate merge the encoder could never apply
    val pc = BpeTrain.pairCounts(docs, col("text"))
      .as[(String, Long)].collect().toMap
    assert(pc == Map(s"$e $e" -> 2L))
    assert(BpeTrain.train(docs, col("text"), 1) == Seq(e -> e))
  }
}
