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
}
