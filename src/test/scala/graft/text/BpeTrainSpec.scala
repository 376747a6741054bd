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

  test("incremental pair maintenance matches a full recount on a mixed corpus") {
    // Naive reference: recount every pair over the whole word table each
    // iteration (the pre-optimization formulation). The shipped train must
    // produce the identical merge sequence.
    def naiveTrain(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
      var words = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w.map(_.toString).toArray, ws.size.toLong) }
        .toArray
      val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var continue = numMerges > 0
      while (continue) {
        val counts = scala.collection.mutable.HashMap[(String, String), Long]()
        words.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.length == 2).foreach { p =>
            counts.update((p(0), p(1)), counts.getOrElse((p(0), p(1)), 0L) + n)
          }
        }
        val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
        best match {
          case Some((pair, c)) if c >= 2 =>
            merges += pair
            words = words.map { case (syms, n) =>
              val out = scala.collection.mutable.ArrayBuffer[String]()
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                  out += pair._1 + pair._2; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, n)
            }
            continue = merges.length < numMerges
          case _ => continue = false
        }
      }
      merges.toSeq
    }
    // deliberately adversarial: repeated chars, overlapping pairs, a pair
    // whose count collapses to zero, ties, and words that evolve past a
    // pair before it is chosen (stale where-index shapes)
    val corpus = Seq(
      "aaab aaab ab abc abc abcd",
      "the then there the then",
      "xyxy xyxy yx yx zz zzz zzzz")
    val got = BpeTrain.train(corpus.toDF("text"), col("text"), numMerges = 12)
    assert(got == naiveTrain(corpus, 12))
  }

  test("numMerges above the driver-loop cap is rejected") {
    val docs = Seq("ab ab").toDF("text")
    intercept[IllegalArgumentException] {
      BpeTrain.train(docs, col("text"), numMerges = BpeTrain.MaxMerges + 1)
    }
    // at most MaxMerges is fine (training stops early on this corpus)
    assert(BpeTrain.train(docs, col("text"), BpeTrain.MaxMerges) == Seq("a" -> "b"))
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
