package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FuzzyJoin: deletion-neighborhood candidates must reproduce the exact
  * thresholded-levenshtein join — sound (verified) and complete (the FastSS
  * identity guarantees every true pair shares a variant). */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  private def brute(words: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- words; (ib, sb) <- words
      dist = levDist(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet

  private def levDist(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private val words = Seq(
    1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "mitten",
    5L -> "bitten", 6L -> "kitchen", 7L -> "smitten", 8L -> "a",
    9L -> "", 10L -> "ab", 11L -> "ba", 12L -> "kitten"
  )

  test("fuzzyJoin equals the brute-force thresholded levenshtein join (d=1, d=2)") {
    val df = words.toDF("id", "w")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.fuzzyJoin(df, "id", "w", df, "id", "w", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute(words, d), s"mismatch at d=$d")
    }
  }

  test("fuzzyJoin covers substitutions, insertions, deletions and transposition-as-2") {
    val l = Seq(1L -> "hello").toDF("id", "w")
    val r = Seq(10L -> "hallo", 11L -> "helloo", 12L -> "hell", 13L -> "ehllo",
      14L -> "help!").toDF("id", "w")
    val got = FuzzyJoin.fuzzyJoin(l, "id", "w", r, "id", "w", 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 1), (1L, 12L, 1), (1L, 13L, 2),
      (1L, 14L, 2)))
  }

  test("fuzzyJoin caps hot variant buckets with a logged drop (never silent quadratic)") {
    // 50 identical strings: uncapped, the "aaaa" bucket alone pairs 50×50
    val dup = (1L to 50L).map(i => (i, "aaaa")).toDF("id", "w")
    val capped = FuzzyJoin.fuzzyJoin(dup, "id", "w", dup, "id", "w", 1,
      maxVariantBucket = 5)
    // smallest-id sample survives on both sides: ids 1-5 pair fully
    val got = capped.as[(Long, Long, Int)].collect().toSet
    assert(got == (for (a <- 1L to 5L; b <- 1L to 5L) yield (a, b, 0)).toSet)
    val full = FuzzyJoin.fuzzyJoin(dup, "id", "w", dup, "id", "w", 1)
    assert(full.count() == 2500)
  }
}
