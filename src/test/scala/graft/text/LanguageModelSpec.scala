package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("self-referential unigram scores match hand-computed log2 means (X4)") {
    val docs = Seq((1L, "a a"), (2L, "b"), (3L, "   ")).toDF("doc_id", "text")
    val got = LanguageModel.unigramLogProb(docs, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // corpus: a×2, b×1, total 3. P(a)=2/3, P(b)=1/3
    val lpA = BigDecimal(math.log(2.0 / 3.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpB = BigDecimal(math.log(1.0 / 3.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 2L, lpA), (2L, 1L, lpB))) // doc 3: no tokens, absent
  }

  test("a reference model scores another corpus; OOV tokens get the floor") {
    val reference = Seq((1L, "x x x y")).toDF("id", "text")
    val model = LanguageModel.unigramCounts(reference, col("text"))
    val docs = Seq((10L, "x z")).toDF("doc_id", "text")
    val got = LanguageModel.unigramLogProb(docs, "doc_id", col("text"), Some(model))
      .as[(Long, Long, Double)].head()
    // z is out-of-vocabulary -> floor 1/(total+1) = 1/5; x -> 3/4
    assert(got._2 == 2L)
    val expected = (math.log(0.75) + math.log(0.2)) / math.log(2.0) / 2
    assert(math.abs(got._3 - expected) < 1e-5)
    // pure-OOV gibberish now scores WORSE than in-vocab text (the filter
    // property the drop-OOV formulation would have inverted)
    val both = Seq((1L, "x x"), (2L, "qq ww")).toDF("doc_id", "text")
    val scores = LanguageModel.unigramLogProb(both, "doc_id", col("text"), Some(model))
      .select("doc_id", "mean_log2_prob").as[(Long, Double)].collect().toMap
    assert(scores(2L) < scores(1L))
  }

  test("truncateVocab keeps the top-k head as a bounded top-k plan") {
    val docs = Seq((1L, "a a a b b c")).toDF("id", "text")
    val model = LanguageModel.unigramCounts(docs, col("text"))
    val top2 = LanguageModel.truncateVocab(model, 2)
    assert(top2.select("token").as[String].collect().sorted.toSeq == Seq("a", "b"))
    val plan = top2.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort leaked:\n$plan")
    // the truncated model still scores — c falls to the OOV floor
    val scored = LanguageModel.unigramLogProb(docs, "id", col("text"), Some(top2))
      .as[(Long, Long, Double)].head()
    assert(scored._2 == 6L)
  }

  test("garbled text scores below natural text (the filter property)") {
    val natural = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val garbled = Seq((99L, "zxqv kjwp mmtr"))
    val docs = (natural ++ garbled).toDF("doc_id", "text")
    val scores = LanguageModel.unigramLogProb(docs, "doc_id", col("text"))
      .select("doc_id", "mean_log2_prob").as[(Long, Double)].collect().toMap
    assert(scores(99L) < scores(1L)) // rare tokens -> much lower mean log-prob
  }

  test("bigram scores match hand-computed interpolated log2 means") {
    val docs = Seq((1L, "a b a b"), (2L, "a a b b"), (3L, "x")).toDF("doc_id", "text")
    val got = LanguageModel.bigramLogProb(docs, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // unigrams a:4 b:4 x:1 total 9; bigrams (a,b):3 (b,a):1 (a,a):1 (b,b):1;
    // contexts a·:4 b·:2
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // multipliers mirror the operator exactly: lit(lambda), lit(1 - lambda)
    def lp(cbi: Long, cctx: Long, cuni: Long) = r6(
      math.log(0.7 * (cbi.toDouble / cctx) + (1 - 0.7) * (cuni.toDouble / 9)) / math.log(2.0))
    // mean mirrors the operator: exact-decimal SUM, then double division
    val d1 = r6((lp(3, 4, 4) * 2 + lp(1, 2, 4)).toDouble / 3).toDouble
    val d2 = r6((lp(1, 4, 4) + lp(3, 4, 4) + lp(1, 2, 4)).toDouble / 3).toDouble
    assert(got == Seq((1L, 3L, d1), (2L, 3L, d2))) // doc 3: no transitions
  }

  test("bigram catches shuffled word order that the unigram model cannot see") {
    // many natural-order docs + one with the SAME unigram distribution but
    // garbled order: unigram scores them identically, bigram must not
    val natural = (1L to 30L).map(i => (i, "the quick brown fox jumps"))
    val shuffled = Seq((99L, "fox the jumps quick brown"))
    val docs = (natural ++ shuffled).toDF("doc_id", "text")
    val uni = LanguageModel.unigramLogProb(docs, "doc_id", col("text"))
      .select("doc_id", "mean_log2_prob").as[(Long, Double)].collect().toMap
    assert(uni(99L) == uni(1L), "unigram is order-blind by construction")
    val bi = LanguageModel.bigramLogProb(docs, "doc_id", col("text"))
      .select("doc_id", "mean_log2_prob").as[(Long, Double)].collect().toMap
    assert(bi(99L) < bi(1L), "bigram must penalize the shuffled doc")
    intercept[IllegalArgumentException](
      LanguageModel.bigramLogProb(docs, "doc_id", col("text"), lambda = 0.0))
  }

  test("perplexityTiers: per-group terciles, garbled docs land in the tail (X48)") {
    // two "languages": six fluent docs + three order-garblings of the same
    // words per language — the garblings must fill each language's tier 3
    val mk = (lang: String, a: String, b: String) =>
      (1L to 6L).map(i => (lang.hashCode * 100L + i, s"$a $a $a", lang)) ++
        (7L to 9L).map(i => (lang.hashCode * 100L + i, b, lang))
    val docs = (mk("en", "the cat sat", "sat the the cat cat sat") ++
        mk("fr", "le chat dort", "dort le le chat chat dort"))
      .toDF("doc_id", "text", "lang")
    val got = LanguageModel.perplexityTiers(docs, "doc_id", col("text"), "lang")
      .select("doc_id", "lang", "tier").as[(Long, String, Int)].collect()
    assert(got.length == 18)
    for (lang <- Seq("en", "fr")) {
      val inGroup = got.filter(_._2 == lang)
      // ntile(3) of 9 rows: exactly 3 per tier
      assert(inGroup.groupBy(_._3).view.mapValues(_.length).toMap ==
        Map(1 -> 3, 2 -> 3, 3 -> 3))
      // the three garbled docs (ids ..07-..09) are the group's tail
      assert(inGroup.filter(_._3 == 3).map(_._1 % 100).toSet == Set(7L, 8L, 9L))
    }
    intercept[IllegalArgumentException](
      LanguageModel.perplexityTiers(docs, "doc_id", col("text"), "lang", tiers = 1))
  }
}
