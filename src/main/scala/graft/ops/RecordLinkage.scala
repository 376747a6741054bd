package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X128 — Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter,
  * JASA 1969): the MATCH-SCORING layer the entity-resolution stack was
  * missing — X16 generates candidate pairs (fuzzy join), q242 blocks and
  * links deterministically, X103 merges survivors, but nothing weighed
  * the EVIDENCE: a phone-number agreement is worth more than a
  * market-segment agreement exactly when phones rarely agree by chance.
  * FS formalizes that: per comparison field f, m_f = P(agree | match)
  * and u_f = P(agree | non-match) estimated from LABELED pairs, and a
  * pair's score is the log-likelihood ratio Σ_f log2(m_f/u_f) over
  * agreeing fields + Σ_f log2((1−m_f)/(1−u_f)) over disagreeing ones —
  * the classical weights every production linker (Splink, the Census
  * Bureau matchers) uses.
  *
  * Exactness discipline (the q234/X112 "one IEEE chain" stance):
  * m/u estimate as exact LAPLACE-smoothed integer micros —
  * m_µ = (agree∧match + 1)·1e6 DIV (matches + 2), likewise u over
  * non-matches (smoothing bounds both inside (0, 1e6): no zero weight,
  * no division blowup); each field's agreement/disagreement weight is
  * then ONE stated float chain, `round(1e6 · ln(m_µ/u_µ) / ln 2)`,
  * yielding micro-LONG weights (the only floats in the operator, per
  * FIELD not per row, replayable by any engine stating the same chain —
  * the q105 log discipline); per-pair scores are exact INTEGER sums of
  * those micro weights in field order. A NULL agreement flag contributes
  * ZERO weight (classical FS missing-data handling: no information, not
  * evidence either way).
  *
  * Scale shape: weight estimation is ONE map-side-combinable aggregation
  * over the labeled pairs (4 counters per field, a 1-row collect);
  * scoring is MAP-ONLY — the weights compile into the projection as
  * literals, no join, no shuffle, whatever the pair count. Labeled pairs
  * must contain both classes (a one-class training set cannot estimate
  * the other side's rates — REFUSED). `maxFields` bounds the counter
  * row and the projection width.
  *
  * Output of [[fsWeights]]: one row per field —
  * `(field, m_micro, u_micro, w_agree_micro, w_disagree_micro)`.
  * [[fsScore]]: `pairs` + `fs_score_micro`. */
object RecordLinkage {

  /** Per-field (m, u, agreement-weight, disagreement-weight) learned
    * from `labeled` pairs. `agreements` maps field name → a BOOLEAN
    * agreement column evaluated on the pair frame; for string identity
    * fields the production comparator is a Jaro-Winkler band —
    * `GraftFunctions.jaroWinklerMicro(a, b) >= thresholdMicro` (the
    * codegen'd [[graft.functions.JaroWinkler]]; Splink's default
    * comparator family) — not raw equality; `isMatch` is the
    * ground-truth label. NULL agreement flags count as DISAGREEMENT for
    * estimation (conservative: absence of evidence of agreement) but
    * contribute zero weight at scoring time — stated, not hidden. */
  def fsWeights(labeled: DataFrame, agreements: Seq[(String, Column)],
      isMatch: Column, maxFields: Int = 16): Seq[(String, Long, Long, Long, Long)] = {
    require(agreements.nonEmpty, "fellegiSunter needs at least one field")
    require(agreements.length <= maxFields,
      s"${agreements.length} comparison fields exceed maxFields=$maxFields")
    require(agreements.map(_._1).distinct.length == agreements.length,
      "duplicate field names in agreements")
    val lab = labeled.select(isMatch.cast("boolean").as("__m") +:
      agreements.zipWithIndex.map { case ((_, c), i) =>
        coalesce(c.cast("boolean"), lit(false)).as(s"__a$i") }: _*)
      .filter(col("__m").isNotNull)
    val aggs = Seq(
      sum(when(col("__m"), 1L).otherwise(0L)).as("__nm"),
      count(lit(1)).as("__n")) ++
      agreements.indices.flatMap(i => Seq(
        sum(when(col("__m") && col(s"__a$i"), 1L).otherwise(0L)).as(s"__am$i"),
        sum(when(!col("__m") && col(s"__a$i"), 1L).otherwise(0L)).as(s"__au$i")))
    val row = lab.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nMatch = row.getLong(0)
    val nTotal = row.getLong(1)
    val nNon = nTotal - nMatch
    require(nMatch >= 1 && nNon >= 1,
      s"fellegiSunter needs BOTH classes in the labeled pairs " +
        s"(matches=$nMatch, non-matches=$nNon) — one class cannot " +
        "estimate the other side's agreement rates")
    agreements.zipWithIndex.map { case ((name, _), i) =>
      val am = row.getLong(2 + 2 * i)
      val au = row.getLong(3 + 2 * i)
      // Laplace: both rates land strictly inside (0, 1e6)
      val mMicro = (am + 1L) * 1000000L / (nMatch + 2L)
      val uMicro = (au + 1L) * 1000000L / (nNon + 2L)
      // the ONE float chain per field, stated for the oracle:
      // round(1e6 · ln(m/u) / ln 2)  — micro-bits of evidence
      def w(num: Long, den: Long): Long =
        math.round(1e6 * math.log(num.toDouble / den.toDouble) / math.log(2.0))
      (name, mMicro, uMicro, w(mMicro, uMicro),
        w(1000000L - mMicro, 1000000L - uMicro))
    }
  }

  /** X129 — UNSUPERVISED Fellegi-Sunter weights via EM (Winkler 1988;
    * the Splink default): real deployments rarely have labeled pairs, so
    * m, u and the match prevalence p are estimated from the agreement-
    * PATTERN histogram alone — the corpus is touched by exactly ONE
    * aggregation (count per 2^F pattern, map-side combinable, ≤ 2^F
    * rows collected; `maxFields` ≤ 12 bounds it at 4096), and the EM
    * loop runs DRIVER-side over that bounded table (the X71 DoReMi
    * stance: corpus-sized work once, iterate on the tiny frame).
    *
    * Exact fixed-point trajectory (engine-replayable): all parameters
    * ride as integer micros; the E-step's class likelihoods are CHAINED
    * FLOOR products — `prod = prod·factor DIV 1e6` per field, every
    * intermediate ≤ 1e12 so the whole chain replays in plain BIGINT —
    * and the posterior w_γ = num·1e6 DIV max(1, num+den); the M-step's
    * updates are exact integer ratios (Σ n·w·γ_f·1e6 DIV Σ n·w etc.,
    * 128-bit safe), every updated parameter CLAMPED into [1, 999999]
    * (a parameter at 0 or 1 absorbs the whole product forever — the
    * Laplace-floor analog, stated). A recursive CTE carrying
    * (p, m_1..F, u_1..F) replays the full trajectory bit-for-bit.
    * Convergence is NOT tested — `iters` is the fixed, replayable
    * round count (the X71 discipline; EM on pattern histograms
    * stabilizes in ≈10 rounds in practice).
    *
    * NULL agreement flags count as disagreement for pattern formation
    * (same stance as [[fsWeights]]). Returns the same shape as
    * [[fsWeights]] — per field `(name, m_micro, u_micro, w_agree_micro,
    * w_disagree_micro)` with the weights from the identical stated
    * ln-chain — plus the learned prevalence via [[EmResult]]. */
  final case class EmResult(prevalenceMicro: Long,
      weights: Seq[(String, Long, Long, Long, Long)])

  def fsWeightsEM(pairs: DataFrame, agreements: Seq[(String, Column)],
      iters: Int = 15, pInitMicro: Long = 100000L,
      mInitMicro: Long = 900000L, uInitMicro: Long = 100000L,
      maxFields: Int = 12): EmResult = {
    require(agreements.nonEmpty, "fsWeightsEM needs at least one field")
    require(agreements.length <= maxFields && maxFields <= 12,
      s"${agreements.length} fields exceed maxFields=$maxFields (≤ 12: " +
        "the pattern histogram is 2^F rows)")
    require(agreements.map(_._1).distinct.length == agreements.length,
      "duplicate field names in agreements")
    require(iters >= 1 && iters <= 1000, s"iters must be in [1,1000], got $iters")
    Seq(("pInit", pInitMicro), ("mInit", mInitMicro), ("uInit", uInitMicro))
      .foreach { case (n, v) => require(v >= 1 && v <= 999999L,
        s"$n must be in [1, 999999] micros, got $v") }
    val f = agreements.length
    // the ONE corpus aggregation: the 2^F pattern histogram
    val flags = agreements.zipWithIndex.map { case ((_, c), i) =>
      coalesce(c.cast("boolean"), lit(false)).as(s"__a$i") }
    val pat = pairs.select(flags: _*)
      .groupBy((0 until f).map(i => col(s"__a$i")): _*)
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => ((0 until f).map(r.getBoolean), r.getLong(f)))
    require(pat.nonEmpty, "fsWeightsEM: no pairs")
    def clamp(v: Long): Long = math.max(1L, math.min(999999L, v))
    var p = pInitMicro
    var m = Array.fill(f)(mInitMicro)
    var u = Array.fill(f)(uInitMicro)
    (1 to iters).foreach { _ =>
      var sumNW = BigInt(0); var sumN1W = BigInt(0); var sumN = BigInt(0)
      val sumNWg = Array.fill(f)(BigInt(0))
      val sumN1Wg = Array.fill(f)(BigInt(0))
      pat.foreach { case (bits, n) =>
        // chained floor products: every intermediate stays ≤ 1e12
        var num = p; var den = 1000000L - p
        (0 until f).foreach { i =>
          num = num * (if (bits(i)) m(i) else 1000000L - m(i)) / 1000000L
          den = den * (if (bits(i)) u(i) else 1000000L - u(i)) / 1000000L
        }
        val w = num * 1000000L / math.max(1L, num + den)
        sumN += n; sumNW += BigInt(n) * w; sumN1W += BigInt(n) * (1000000L - w)
        (0 until f).foreach { i =>
          if (bits(i)) { sumNWg(i) += BigInt(n) * w
            sumN1Wg(i) += BigInt(n) * (1000000L - w) }
        }
      }
      p = clamp((sumNW / sumN).toLong)
      (0 until f).foreach { i =>
        m(i) = clamp((sumNWg(i) * 1000000L / sumNW.max(BigInt(1))).toLong)
        u(i) = clamp((sumN1Wg(i) * 1000000L / sumN1W.max(BigInt(1))).toLong)
      }
    }
    def wgt(num: Long, den: Long): Long =
      math.round(1e6 * math.log(num.toDouble / den.toDouble) / math.log(2.0))
    EmResult(p, agreements.zipWithIndex.map { case ((name, _), i) =>
      (name, m(i), u(i), wgt(m(i), u(i)),
        wgt(1000000L - m(i), 1000000L - u(i)))
    })
  }

  /** Score `pairs` with weights learned from `labeled` (often the same
    * frame): appends `fs_score_micro` — the exact integer sum of the
    * per-field micro weights, agreement → w_agree, disagreement →
    * w_disagree, NULL → 0. Map-only: the weights ride as literals. */
  def fsScore(pairs: DataFrame, labeled: DataFrame,
      agreements: Seq[(String, Column)], isMatch: Column,
      maxFields: Int = 16): DataFrame =
    fsScoreWith(pairs, agreements,
      fsWeights(labeled, agreements, isMatch, maxFields))

  /** Score `pairs` with EXTERNALLY-supplied weights (the [[fsWeights]] /
    * [[fsWeightsEM]] shape) — the serving face: weights learned once
    * (supervised or EM), applied map-only to any pair batch. Field
    * names must align positionally with the weight rows (refused
    * otherwise — a silently mis-mapped weight scores garbage). */
  def fsScoreWith(pairs: DataFrame, agreements: Seq[(String, Column)],
      weights: Seq[(String, Long, Long, Long, Long)]): DataFrame = {
    require(!pairs.columns.contains("fs_score_micro"),
      "column name fs_score_micro is reserved by fsScore")
    require(agreements.map(_._1) == weights.map(_._1),
      s"agreement fields ${agreements.map(_._1).mkString(",")} do not " +
        s"align with weight rows ${weights.map(_._1).mkString(",")}")
    val score = agreements.zip(weights).map { case ((_, c), (_, _, _, wa, wd)) =>
      when(c.isNull, 0L).when(c.cast("boolean"), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    pairs.withColumn("fs_score_micro", score.cast("long"))
  }

  /** X130 — reciprocal best match: turn a SCORED candidate-pair frame
    * into ONE-TO-ONE links — keep (a, b) iff b is a's best-scoring
    * partner AND a is b's (the mutual-nearest-neighbor / bioinformatics
    * "reciprocal best hit" rule) — the step between pair scoring (X128/
    * X129 / X16's fuzzy candidates) and golden-record merge (X103),
    * where a record must not be consumed by two different masters.
    * Chosen over greedy global assignment because it is ORDER-FREE: the
    * kept set is a pure function of the scores (greedy depends on
    * processing order, which no relational oracle can replay), at the
    * known cost that a record whose best partner prefers someone else
    * goes UNMATCHED rather than taking its second choice — the
    * conservative, auditable behavior a dedup pipeline wants.
    *
    * Determinism: "best" = highest score, ties broken by SMALLEST
    * partner id (both stated; equal-score ties are real under integer
    * micro weights). Duplicate (left, right) rows collapse to their MAX
    * score first, so a candidate generator that emits a pair twice
    * (multi-band LSH) cannot double-rank it.
    *
    * Scale shape: one (left, right) collapse aggregation, then TWO
    * keyed windows (rank within left, rank within right — two
    * pair-sized Exchanges, the rule's intrinsic cost) and a filter.
    * No driver state, no joins. Output: `(left, right, score)` of the
    * mutual-best pairs. */
  def reciprocalBestMatch(pairs: DataFrame, leftId: Column,
      rightId: Column, score: Column): DataFrame = {
    val base = pairs.select(leftId.as("left"), rightId.as("right"),
        score.cast("long").as("score"))
      .filter(col("left").isNotNull && col("right").isNotNull &&
        col("score").isNotNull)
      .groupBy("left", "right").agg(max(col("score")).as("score"))
    val wL = org.apache.spark.sql.expressions.Window
      .partitionBy("left").orderBy(col("score").desc, col("right").asc)
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy("right").orderBy(col("score").desc, col("left").asc)
    base
      .withColumn("__rl", row_number().over(wL))
      .withColumn("__rr", row_number().over(wR))
      .filter(col("__rl") === 1 && col("__rr") === 1)
      .select("left", "right", "score")
  }
}
