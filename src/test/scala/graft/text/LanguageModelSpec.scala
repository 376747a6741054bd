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
}
