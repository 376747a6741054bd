package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Perplexity-proxy quality scoring (SURVEY.md §2.9 X4): mean log2
  * probability of each document's tokens under a unigram language model —
  * the CCNet/Gopher-style filter where low scorers are garbled, boilerplate
  * or off-language text.
  *
  * The model here is self-referential (the corpus scores itself — the
  * standard bootstrap when no reference model exists); to score against a
  * REFERENCE corpus, pass its frequency table as `model`.
  *
  * Scale design: two aggregation passes, both corpus-bounded —
  *  1. token frequencies: partial-aggregated groupBy, output is
  *     vocab-sized, not corpus-sized;
  *  2. scoring: token stream equi-joined to the frequency table (a hot
  *     token is ONE row on the model side — no skew blowup; AQE broadcasts
  *     vocab-sized models), then one per-doc aggregation.
  * The corpus-wide token total rides in-plan as a broadcast 1-row frame —
  * no driver `count()`. Per-token log-probs round to 6 decimals and the
  * per-doc mean goes through an exact decimal sum, so scores are bit-stable
  * across partitionings and engines. Docs with zero tokens are absent from
  * the output (they have no token distribution to score).
  */
object LanguageModel {

  /** Unigram frequency table of a corpus: (token, cnt). */
  def unigramCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextStats.tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Truncate a model to its `k` most frequent tokens (ties by token, so
    * the cut is deterministic). Bounded top-k (`TakeOrderedAndProject`),
    * never a global sort. A web-scale corpus has an unbounded vocab — the
    * full table can't broadcast into the scoring join — but scoring only
    * needs the head of the Zipf curve: truncate, broadcast, and let the
    * OOV floor absorb the tail (standard perplexity-filter practice). */
  def truncateVocab(model: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    model.orderBy(desc("cnt"), col("token")).limit(k)
  }

  /** Per-document mean log2 token probability under `model` (defaults to
    * the corpus's own [[unigramCounts]]). Output:
    * (id, n_tokens, mean_log2_prob), n_tokens counting EVERY token.
    *
    * Out-of-vocabulary tokens (only possible with a reference `model`;
    * self-referential scoring has none) receive the floor probability
    * `1/(total+1)` — dropping them would OVERESTIMATE the quality of
    * exactly the gibberish the filter exists to catch (a document of pure
    * OOV noise would otherwise score on its few known tokens, or vanish
    * from the output entirely). */
  def unigramLogProb(docs: DataFrame, id: String, text: Column,
      model: Option[DataFrame] = None): DataFrame = {
    val toks = docs.select(col(id), explode(TextStats.tokens(text)).as("token"))
    val freqs = model.getOrElse(unigramCounts(docs, text))
    val total = freqs.agg(sum(col("cnt")).as("__total"))
    toks.join(freqs, Seq("token"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__lp", round(log2(coalesce(
        col("cnt").cast("double") / col("__total").cast("double"),
        lit(1.0) / (col("__total").cast("double") + 1.0))), 6))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("__lp").cast(DecimalType(28, 6))).cast("double")
          / count(lit(1)), 6).as("mean_log2_prob"))
  }

  /** Per-document token-transition stream: (id, w1, w2) for every adjacent
    * token pair. Documents under two tokens contribute no rows. */
  private def transitions(docs: DataFrame, id: String, text: Column): DataFrame = {
    val tk = TextStats.tokens(text)
    docs.select(col(id),
        explode(arrays_zip(
          slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
          slice(tk, lit(2), greatest(size(tk) - 1, lit(0))))).as("__t"))
      .select(col(id), col("__t.0").as("__w1"), col("__t.1").as("__w2"))
  }

  /** Per-document mean log2 transition probability under an interpolated
    * bigram model — one Markov order above [[unigramLogProb]], which a
    * shuffled-word document fools (same unigram distribution, garbled
    * order) and this catches. Self-referential like the unigram default:
    *
    *   p(w2 | w1) = λ · c(w1 w2)/c(w1 ·) + (1 − λ) · c(w2)/total
    *
    * (Jelinek-Mercer interpolation; the unigram back-off term keeps unseen
    * transitions finite, so no OOV floor is needed in the self-referential
    * case). Output: (id, n_transitions, mean_log2_prob); docs with fewer
    * than two tokens have no transitions and are absent.
    *
    * Scale: the transition stream is exploded once and aggregated three
    * ways (bigram counts, context counts, unigram counts) — each
    * partial-aggregated, vocab- or vocab²-bounded, never corpus-row-bound;
    * scoring joins are keyed equi-joins (hot tokens are ONE model-side row;
    * AQE broadcasts vocab-sized tables). Per-transition log-probs round to
    * 6 and the per-doc mean sums in exact DECIMAL — bit-stable across
    * partitionings and engines, same contract as the unigram path. */
  def bigramLogProb(docs: DataFrame, id: String, text: Column,
      lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1], got $lambda")
    val trans = transitions(docs, id, text)
    val cBi = trans.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__cbi"))
    // context totals c(w1 ·) = transitions starting at w1 — derived from the
    // bigram table (vocab²-sized), not the corpus stream, so the second
    // aggregation is over already-collapsed state
    val cCtx = cBi.groupBy(col("__w1")).agg(sum(col("__cbi")).as("__cctx"))
    val uni = docs.select(explode(TextStats.tokens(text)).as("__w2"))
      .groupBy(col("__w2")).agg(count(lit(1)).as("__cuni"))
    val total = uni.agg(sum(col("__cuni")).as("__total"))
    val pBi = col("__cbi").cast("double") / col("__cctx")
    val pUni = col("__cuni").cast("double") / col("__total")
    val lp = round(log2(lit(lambda) * pBi + lit(1 - lambda) * pUni), 6)
    trans
      .join(cBi, Seq("__w1", "__w2"))
      .join(cCtx, Seq("__w1"))
      .join(uni, Seq("__w2"))
      .crossJoin(broadcast(total))
      .withColumn("__lp", lp)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_transitions"),
        round(sum(col("__lp").cast(DecimalType(28, 6))).cast("double")
          / count(lit(1)), 6).as("mean_log2_prob"))
  }

  /** X48 — CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    * rank every document within its `groupCol` slice (per language, in
    * CCNet) by [[bigramLogProb]] fluency and split the slice into `tiers`
    * equal buckets — tier 1 is the "head" (most fluent), the last tier the
    * "tail". The per-group split is the point: a single global perplexity
    * threshold conflates languages (a fluent low-resource-language page
    * scores worse than garbled English under a shared model); tiering
    * inside each group makes the cut distribution-relative, and downstream
    * mixing can then sample head-heavy without zeroing any language.
    *
    * Scale shape: the LM build is two corpus-bounded aggregations
    * (vocab-sized outputs — see [[bigramLogProb]]); the tiering adds ONE
    * window shuffle partitioned by the group key, so groups parallelize
    * and no global sort exists. Ties break on the id, making tier
    * assignment deterministic under retries and across engines (ntile's
    * frame arithmetic is the same rational split everywhere). Documents
    * with zero transitions are absent (no distribution to score), matching
    * [[bigramLogProb]]. */
  def perplexityTiers(docs: DataFrame, id: String, text: Column,
      groupCol: String, tiers: Int = 3, lambda: Double = 0.7): DataFrame = {
    require(tiers >= 2, s"tiers must be >= 2, got $tiers")
    require(docs.columns.contains(groupCol), s"no column '$groupCol' in docs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("mean_log2_prob").desc, col(id))
    bigramLogProb(docs, id, text, lambda)
      .join(docs.select(col(id), col(groupCol)), Seq(id))
      .withColumn("tier", ntile(tiers).over(w))
  }
}
