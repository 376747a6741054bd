package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X41 — DSIR: Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023). Score every raw-corpus document by how much more likely
  * its hashed n-gram features are under a TARGET domain (the data you want
  * more of — a wiki/books sample) than under the RAW corpus itself, then
  * resample the corpus with Gumbel-top-k on those importance weights. The
  * published recipe for "make 100 TB of crawl look like the target domain
  * without training a classifier".
  *
  * Feature model (the paper's): word unigrams + bigrams hashed into B
  * buckets; a document is its bag of bucket hits; both distributions are
  * bucket-count vectors with add-one smoothing. log w(doc) =
  * Σ_grams [ln p_target(bucket) − ln p_raw(bucket)].
  *
  * Engine-portable exactness, in the house style (SURVEY §2.9 X6/X12):
  *  - buckets come from the md5-prefix hash ("seed:gram" → first 8 hex
  *    chars → mod B), identical in any engine with md5;
  *  - the per-BUCKET log-ratio is computed ONCE over the B-row distribution
  *    table as round(1e6 · ln((ct+1)(R+B) / ((cr+1)(T+B)))) — integer
  *    micro-nats; both products are exact in a double far beyond any real
  *    bucket count (< 2⁵³);
  *  - a document's score is the exact INTEGER sum of its grams' micro-nat
  *    ratios — order-independent under any partitioning, so the only
  *    cross-engine risk is ln's last ulp flipping a single bucket's
  *    rounding at a 0.5e-6 boundary (hash-collision-scale odds, the
  *    weightedSampleK caveat).
  *
  * Scale shape: distributions are ONE aggregation each producing a ≤ B-row
  * frame (B is config, 10⁴ in the paper — KB-sized, broadcast); scoring is
  * explode → broadcast-join → re-aggregate on the document key, so the
  * corpus is scanned once and nothing shuffles wider than (doc, gram-count)
  * partial sums. The Gumbel resample is map-only priorities + one
  * TakeOrderedAndProject, exactly the X12 sampler's shape.
  */
object Dsir {

  /** Hashed gram-bucket id (0 ≤ b < buckets) of a gram string — the
    * md5-prefix uniform hash, mod the bucket count. */
  private def bucketOf(gram: Column, buckets: Int, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:"), gram)), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Per-row exploded (id, bucket) hits: word unigrams + bigrams, hashed.
    * Documents with no tokens contribute no rows (their score is the empty
    * sum — callers re-attach them with a left join). */
  def bucketHits(docs: DataFrame, id: String, text: String,
      buckets: Int, seed: String = "dsir"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grams = concat(TextStats.shingles(col(text), 1),
      TextStats.shingles(col(text), 2))
    docs.select(col(id), explode(grams).as("__gram"))
      .select(col(id), bucketOf(col("__gram"), buckets, seed).as("bucket"))
  }

  /** [[bucketHits]] plus the per-row gram count carried in-frame:
    * `(id, __n, bucket)`. Per-doc frequency consumers group by
    * (id, __n, bucket) — __n is a function of the row, so the grouping
    * is unchanged — instead of re-deriving the count with a
    * post-aggregation window (one Exchange + Sort saved per pass). */
  def bucketHitsWithCount(docs: DataFrame, id: String, text: String,
      buckets: Int, seed: String = "dsir"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grams = concat(TextStats.shingles(col(text), 1),
      TextStats.shingles(col(text), 2))
    docs.select(col(id), grams.as("__grams"))
      .select(col(id), size(col("__grams")).as("__n"),
        explode(col("__grams")).as("__gram"))
      .select(col(id), col("__n"),
        bucketOf(col("__gram"), buckets, seed).as("bucket"))
  }

  /** Bucket-count distribution of a corpus: (bucket, cnt), ≤ B rows.
    * One aggregation; map-side partial sums keep the shuffle B-sized. */
  def bucketDistribution(docs: DataFrame, id: String, text: String,
      buckets: Int, seed: String = "dsir"): DataFrame =
    bucketHits(docs, id, text, buckets, seed)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** The per-bucket importance log-ratio table in integer micro-nats:
    * (bucket, lr_micro) for every bucket present in `raw`, with add-one
    * smoothing on both sides. `target`/`raw` are [[bucketDistribution]]
    * frames. Buckets absent from raw are absent here — score only corpora
    * the raw distribution was built over (the DSIR setting). */
  def logRatioTable(target: DataFrame, raw: DataFrame, buckets: Int): DataFrame = {
    // totals ride as a broadcast one-row aggregate (the q41/rebalance idiom)
    // — no driver-side action before the plan exists
    val totals = raw.agg(coalesce(sum(col("cnt")), lit(0L)).as("__r"))
      .crossJoin(target.agg(coalesce(sum(col("cnt")), lit(0L)).as("__t")))
    raw.select(col("bucket"), col("cnt").as("__cr"))
      .join(target.select(col("bucket"), col("cnt").as("__ct")), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(lit(1e6) * log(
          ((coalesce(col("__ct"), lit(0L)) + 1L) * (col("__r") + buckets)).cast("double")
            / ((col("__cr") + 1L) * (col("__t") + buckets)).cast("double")))
          .cast("long").as("lr_micro"))
  }

  /** Per-document importance scores in micro-nats: (id-cols of `docs`,
    * score_micro). Exact integer sum of the document's grams' bucket
    * ratios; token-less documents score 0. One corpus scan, one broadcast
    * join against the B-row ratio table, one keyed re-aggregation. */
  def importanceScores(docs: DataFrame, id: String, text: String,
      target: DataFrame, raw: DataFrame, buckets: Int,
      seed: String = "dsir"): DataFrame = {
    val lr = logRatioTable(target, raw, buckets)
    val scored = bucketHits(docs, id, text, buckets, seed)
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(id).agg(sum(col("lr_micro")).as("score_micro"))
    docs.select(col(id))
      .join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** [[importanceScores]] for the COMMON DSIR setting — raw = the corpus
    * itself, target = the subset of it satisfying `targetPred` (the paper's
    * own experiments: target is a quality slice of the same crawl). The
    * general form hashes every gram THREE times (target distribution, raw
    * distribution, scoring pass — three full corpus scans, three md5
    * explodes); here the (id, bucket) hits frame is computed ONCE,
    * persisted, and serves all three consumers — at 100 TB that is the
    * difference between one pass over the corpus and three, and the hits
    * frame it trades for memory is gram-count-sized integers, spillable
    * and far smaller than the text it came from. Identical arithmetic to
    * the general form (DsirSpec pins value equality): the target
    * distribution over `hits WHERE pred` IS bucketDistribution of the
    * filtered corpus. The returned frame is eagerly lineage-truncated
    * (doc-sized) so the hits cache can be dropped before return instead
    * of squatting in executor storage for the session.
    *
    * Measured crossover (sf0.1, local[32]): the general form's three
    * passes stay FUSED into pipelined stages and run 0.44–0.81 s warm,
    * while this form's persist + broadcast + eager-truncate job barriers
    * cost 2.5–5.8 s — at benchmark SF the barriers dominate and the
    * general form wins. Reach for this one when the corpus scan is the
    * cost (the actual 100 TB setting), not by default. */
  def importanceScoresSelfRaw(docs: DataFrame, id: String, text: String,
      targetPred: Column, buckets: Int, seed: String = "dsir"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grams = concat(TextStats.shingles(col(text), 1),
      TextStats.shingles(col(text), 2))
    val hits = docs
      .select(col(id), targetPred.as("__tgt"), explode(grams).as("__gram"))
      .select(col(id), col("__tgt"),
        bucketOf(col("__gram"), buckets, seed).as("bucket"))
      .persist()
    try {
      val raw = hits.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      val target = hits.filter(col("__tgt"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      val lr = logRatioTable(target, raw, buckets)
      val scored = hits.join(broadcast(lr), Seq("bucket"))
        .groupBy(id).agg(sum(col("lr_micro")).as("score_micro"))
      val out = docs.select(col(id))
        .join(scored, Seq(id), "left")
        .select(col(id), coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      graft.core.Checkpointing.truncate(out, eager = true, None)
    } finally hits.unpersist()
  }

  /** Gumbel-top-k importance resample (the paper's sampling step): rank by
    * score/1e6 + Gumbel(0,1) with the Gumbel drawn from the key's md5
    * uniform — g = −ln(−ln(u)), u = (h + 0.5)/2³² — and keep the top k.
    * Inclusion odds ∝ exp(score): the softmax-without-replacement sample,
    * deterministic under retries/re-partitioning and oracle-replayable.
    * Map-only + TakeOrderedAndProject (the X12 shape); the ln caveat of
    * weightedSampleK applies to the priority's last ulp. */
  def gumbelResampleK(scored: DataFrame, key: Column, scoreMicro: Column,
      k: Int, seed: String = "dsir-g"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!scored.columns.contains("__pri"),
      "gumbelResampleK reserves column name __pri; rename it first")
    val h = conv(substring(md5(concat(lit(s"$seed:"), key.cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    scored
      .withColumn("__pri", scoreMicro.cast("double") / lit(1e6) - log(-log(u)))
      .orderBy(col("__pri").desc, key.cast("string"))
      .limit(k)
      .drop("__pri")
  }
}
