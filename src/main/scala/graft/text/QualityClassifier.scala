package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X66 — hashed-feature linear quality classifier: the fastText-style
  * model-based filter every production curation stack runs next to the
  * rule screens (CCNet's "looks like Wikipedia" filter, GPT-3's
  * WebText-vs-crawl classifier, Llama's "could be a reference" gate).
  * A logistic regression over hashed word unigram+bigram frequencies —
  * the [[Dsir]] feature model with LEARNED per-bucket weights instead of
  * the closed-form log-ratio — trained by full-batch gradient descent and
  * applied as one map-side scoring pass.
  *
  * Where DSIR asks "which bucket distribution does this doc resemble",
  * the classifier optimizes separation directly, which is why the two
  * coexist in published pipelines: DSIR for importance RESAMPLING toward
  * a target, the classifier for a hard keep/drop GATE at a threshold.
  *
  * Determinism contract (the house fixed-point recipe — SURVEY §2.9
  * X32/X41): every quantity is an integer in micro units, every division
  * is a floor of a non-negative shifted dividend (truncating and flooring
  * division agree there, so Spark's `DIV` and DuckDB's `//` replay each
  * other), and every sum is an exact integer sum — order-free under any
  * partitioning, retry, or AQE re-plan. The ONE float in the loop is the
  * logistic `exp`, immediately rounded to micro resolution; a last-ulp
  * engine disagreement flips a p by 1e-6 only when the true value sits
  * within ~1e-10 of a rounding boundary (the accepted ln/pow caveat).
  * Round 1 is exactly float-free: w₀ = 0 means every margin is 0 and
  * σ(0) = 0.5 = 500000 micros exactly.
  *
  * Fixed-point update, dimensional bookkeeping (Micro = 1e6):
  *   x  = (Micro·cnt_db) DIV n_d            per-doc bucket frequency
  *   S  = Σ_b w_b·x_db                      exact; |S| ≤ max|w|·Micro
  *   m  = fdiv(S, Micro)                    margin in micros
  *   p  = round(Micro·σ(m/Micro))           the one float, re-pinned
  *   g  = Σ_d (y_d − p_d)·x_db              exact; |g| ≤ N·Micro²
  *   w += fdiv(lr·fdiv(g, N), Micro²)       mean-gradient ascent step
  * with fdiv = floor division. Overflow budget: |w| ≤ iterations·lr ≤
  * 2.5e8 micros, so S ≤ 2.5e14 and lr·fdiv(g,N) ≤ 5e18 — inside Long,
  * and inside the 1e16/4e18 oracle shift constants (the `require`s pin
  * the budget; N ≤ 9e6 keeps g itself inside Long — train on a sample
  * beyond that, which is what production quality classifiers do anyway:
  * the GATE scores 100 TB, the FIT needs only enough rows to estimate
  * ~buckets parameters).
  *
  * Scale shape: features are ONE corpus scan (md5 explode → (doc,
  * bucket)-keyed count with map-side combine), persisted once for the
  * whole training loop; each iteration is one broadcast join against the
  * ≤ buckets-row weight table, one doc-keyed aggregation (margins), one
  * bucket-keyed aggregation (gradients), and one bounded collect of
  * ≤ buckets rows — nothing corpus-sized crosses the driver, nothing
  * wider than the feature frame shuffles. Scoring is map-only plus one
  * doc-keyed sum.
  */
object QualityClassifier {

  private val Micro = 1000000L
  // fdiv-by-Micro as a non-negative truncating division, portable between
  // Spark `DIV` and DuckDB `//`: (S + 1e16) DIV 1e6 − 1e10. The 1e16 shift
  // dominates the |S| ≤ 2.5e14 budget proven in the scaladoc.
  private val MarginShifted = "(%s + 10000000000000000) DIV 1000000 - 10000000000"

  /** Per-document hashed-gram frequency features: `(id, bucket, x_micro)`
    * with x = (Micro·cnt) DIV n over the doc's unigram+bigram bucket hits
    * ([[Dsir.bucketHits]] — the md5 bucket hash, engine-portable). Docs
    * with no tokens emit no rows (their margin is the empty sum = 0). One
    * corpus scan; the window runs over the (doc,bucket)-aggregated frame,
    * never the raw hits. Ids must be UNIQUE per document: duplicated ids
    * would merge counts across rows in the (id, __n, bucket) grouping
    * while __n stays the single row's gram count, inflating x_micro —
    * the [[train]] contract, stated here because this is where it bites. */
  def features(docs: DataFrame, id: String, text: String, buckets: Int,
      seed: String = "qc"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // Prune to (id, text) and spread before the gram explode: the hash
    // pass is the map-heavy stage and inherits the scan's row-group-
    // bounded parallelism otherwise (explicit count — AQE would coalesce
    // a count-less keyed repartition of a corpus this small right back).
    val base = docs.select(col(id), col(text))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col(id))
    // __n (the doc's total gram count) rides the gram frame and the
    // groupBy key — it is a function of the doc id, so the grouping is
    // unchanged and the former post-aggregation window (one extra
    // Exchange + Sort per feature pass) disappears
    Dsir.bucketHitsWithCount(base, id, text, buckets, seed)
      .groupBy(col(id), col("__n"), col("bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col(id), col("bucket"),
        expr("(1000000 * __cnt) DIV __n").as("x_micro"))
  }

  /** Train by `iterations` rounds of full-batch gradient ascent on the
    * log-likelihood; `label` is the positive-class predicate (the curated
    * slice the filter should recognize). Returns the learned weights as
    * bucket → w_micro — buckets never seen in training are implicitly 0
    * ([[score]] coalesces). The returned map is ≤ `buckets` entries —
    * codebook-sized driver state, same class as the IVF centroid tables.
    *
    * Ids are assumed UNIQUE per document (the fixture/corpus contract):
    * a duplicated id would merge its rows' gram counts in the feature
    * aggregation while `__n` stays each row's own count, silently skewing
    * that id's x_micro — dedupe upstream if ids can repeat. */
  def train(docs: DataFrame, id: String, text: String, label: Column,
      buckets: Int, iterations: Int, lrMicro: Long = 2000000L,
      seed: String = "qc"): Map[Long, Long] = {
    // persisted PRE-PARTITIONED on the doc id: every iteration's margin
    // aggregation and p re-join are id-keyed, so they reuse this one
    // partitioning instead of exchanging the feature frame per round
    val feats = features(docs, id, text, buckets, seed)
      .join(docs.select(col(id),
        when(label, Micro).otherwise(0L).as("__y")), id)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col(id))
      .persist()
    try trainOnFeatures(feats, id, docs.count(), iterations, lrMicro)
    finally feats.unpersist()
  }

  /** The gradient loop over a PREPARED feature frame — [[train]]'s inner
    * face for callers that featurize ONCE and reuse the frame across train
    * and score (one corpus gram pass instead of two — the q208/q216/q226
    * shape). `feats` must carry (id, bucket, x_micro, __y = label·1e6)
    * rows exactly as [[features]]+label-join builds them (extra columns
    * are ignored), `n` is the training document count (including docs with
    * no tokens), and the caller owns persisting/pre-partitioning the frame
    * on the id (every round scans it twice). Values are identical to
    * [[train]] by construction — same loop, same floors. */
  def trainOnFeatures(feats: DataFrame, id: String, n: Long,
      iterations: Int, lrMicro: Long = 2000000L): Map[Long, Long] = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(lrMicro >= 1 && lrMicro <= 5000000L,
      s"lrMicro must be in [1, 5e6] (the Long-overflow budget), got $lrMicro")
    require(n > 0, "train needs at least one document")
    require(n <= 9000000L,
      s"full-batch gradient sums overflow Long beyond ~9e6 docs (got $n); " +
        "fit on a sample — the gate scores everything, the fit doesn't need to")
    val spark = feats.sparkSession
    import spark.implicits._
    var w = Map.empty[Long, Long]
    var i = 0
    while (i < iterations) {
      val p =
        if (w.isEmpty) // round 1: every margin is 0, σ(0) exactly 0.5
          feats.select(col(id)).distinct()
            .withColumn("__p", lit(Micro / 2))
        else {
          val wDf = broadcast(w.toSeq.toDF("bucket", "__w"))
          feats.join(wDf, Seq("bucket"), "left")
            .groupBy(col(id))
            .agg(sum(coalesce(col("__w"), lit(0L)) * col("x_micro")).as("__s"))
            .select(col(id),
              round(lit(1e6) / (lit(1.0) +
                exp(-expr(MarginShifted.format("__s")).cast("double") / lit(1e6))))
                .cast("long").as("__p"))
        }
      // per-bucket mean gradient: one keyed aggregation, ≤ buckets rows out
      val grads = feats.join(p, Seq(id))
        .groupBy(col("bucket"))
        .agg(sum((col("__y") - col("__p")) * col("x_micro")).as("__g"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      w = grads.map { case (b, g) =>
        // driver-side floor division IS the oracle's shifted `//` form
        val step = Math.floorDiv(lrMicro * Math.floorDiv(g, n), Micro * Micro)
        b -> (w.getOrElse(b, 0L) + step)
      }.toMap
      i += 1
    }
    w
  }

  /** Score every document under a trained model: `(id, margin_micro,
    * p_micro)` — the margin (feature-dot-weights, micros) and the logistic
    * probability at micro resolution. Map-only feature pass + one
    * broadcast join + one doc-keyed sum; docs with no tokens (or no known
    * buckets) score margin 0, p 500000. The caller thresholds p (or
    * margin — same ordering, no float) for the keep/drop gate. */
  def score(docs: DataFrame, id: String, text: String,
      weights: Map[Long, Long], buckets: Int,
      seed: String = "qc"): DataFrame =
    scoreOnFeatures(docs.select(col(id)),
      features(docs, id, text, buckets, seed), id, weights)

  /** [[score]] over a PREPARED feature frame (the [[trainOnFeatures]]
    * counterpart): `ids` supplies the document universe to score (docs
    * with no feature rows score margin 0, p 500000 — the empty sum),
    * `feats` the (id, bucket, x_micro) rows. Same floors, same one
    * logistic float — values identical to [[score]]. */
  def scoreOnFeatures(ids: DataFrame, feats: DataFrame, id: String,
      weights: Map[Long, Long]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.toSeq.toDF("bucket", "__w"))
    val margins = feats
      .join(wDf, Seq("bucket"), "left")
      .groupBy(col(id))
      .agg(sum(coalesce(col("__w"), lit(0L)) * col("x_micro")).as("__s"))
    ids.select(col(id))
      .join(margins, Seq(id), "left")
      .select(col(id),
        expr(MarginShifted.format("coalesce(__s, 0)")).as("margin_micro"))
      .withColumn("p_micro",
        round(lit(1e6) / (lit(1.0) +
          exp(-col("margin_micro").cast("double") / lit(1e6)))).cast("long"))
  }
}
