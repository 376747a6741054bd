package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** X79 — Poisson-bootstrap confidence intervals: error bars for corpus
  * metrics computed in ONE scan, the way uncertainty is actually
  * estimated over data too big to resample (Chamandy et al., "Estimating
  * uncertainty for massive data streams", Google 2012; Kleiner et al.'s
  * BLB is the other published answer). The classical bootstrap draws B
  * resamples of n rows WITH replacement — unusable at 100 TB because
  * each resample is a coordinated global draw. The Poisson bootstrap
  * replaces the multinomial row counts with independent Poisson(1)
  * weights per (row, replicate) — for large n the distributions coincide
  * — which makes the whole procedure embarrassingly parallel: every row
  * computes its B weights locally, partial aggregation reduces each
  * replicate to (Σw, Σw·x) map-side, and only B rows ever cross the
  * shuffle.
  *
  * Determinism (the [[graft.text.Dsir]] hash-randomness stance): the
  * weight for (id, replicate b) derives from the md5-uniform of
  * (seed, b, id) pushed through the Poisson(1) inverse CDF — the CDF
  * levels are pre-floored to 32-bit INTEGER thresholds
  * ([[poissonThresholds]]), so the draw is a chain of integer
  * comparisons any engine replays bit-for-bit; no Random, no float
  * comparison, identical under retries and re-partitionings. The tail
  * past the last threshold (probability < 1e-9 per cell) caps at
  * `thresholds.size` — the truncation bias is orders of magnitude below
  * the bootstrap's own Monte-Carlo error at any sane B.
  *
  * Replicate means are exact-decimal Σw·x over integer Σw (addition-
  * order-free, [[Ops.sumDec]]'s stance) rounded to micros, and the CI
  * bounds are ORDER STATISTICS over the B replicate means (percentile
  * bootstrap): lo = the ⌈αB⌉-th smallest, hi = the ⌈(1−α)B⌉-th — exact
  * integer indices, no interpolation to diverge on. Cost is B weight
  * draws per row in one pass (the documented trade-off: B multiplies
  * map-side work, never shuffle width), so B in the low hundreds is the
  * operating range — the same knob every published deployment tunes. */
object Bootstrap {

  /** Cumulative Poisson(1) CDF levels floored to 32-bit integer
    * thresholds: weight(u32) = number of thresholds ≤ u32 (equivalently
    * the smallest k with u32 < t_k). Public so oracles rebuild the same
    * chain from the same longs. */
  val poissonThresholds: Seq[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var term = math.exp(-1.0) // e^-1 / 0!
    var cum = term
    var k = 1
    var t = math.floor(cum * 4294967296.0).toLong
    while (t < 4294967295L) {
      buf += t
      term /= k
      cum += term
      k += 1
      t = math.floor(cum * 4294967296.0).toLong
    }
    buf += 4294967295L // absorbing cap: u32 can never reach 2^32
    buf.toSeq
  }

  /** The Poisson(1) weight of `u32` (a uniform 32-bit integer column). */
  private def weightOf(u32: Column): Column =
    poissonThresholds.zipWithIndex.foldRight(
        lit(poissonThresholds.size.toLong)) { case ((t, k), acc) =>
      when(u32 < t, k.toLong).otherwise(acc)
    }

  /** One-scan percentile-bootstrap CI for the mean of `value` (values
    * exact at `scale` decimals, the [[Ops.sumDec]] contract). `id` must
    * be row-unique and deterministic (a key, not a synthesized ordinal) —
    * it seeds each row's weights. Returns ONE row:
    * (n, replicates, mean_micro, lo_micro, hi_micro), the full-sample
    * mean plus the [alphaMicro, 1−alphaMicro] percentile interval.
    * NULL ids or values are refused (a silently dropped row would shift
    * every replicate identically and the CI would not cover it). */
  def meanCI(df: DataFrame, id: Column, value: Column, replicates: Int,
      seed: String, alphaMicro: Long = 25000L, scale: Int = 2): DataFrame = {
    require(replicates >= 20 && replicates <= 10000,
      s"replicates must be in [20, 10000], got $replicates")
    require(alphaMicro > 0 && 2 * alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 5e5), got $alphaMicro")
    require(seed.nonEmpty, "seed must be non-empty")
    val base = df.select(id.cast("string").as("__id"),
      value.cast("double").as("__v"))
    val bad = base.filter(col("__id").isNull || col("__v").isNull)
      .limit(1).collect()
    require(bad.isEmpty,
      "meanCI: NULL id or value — filter upstream explicitly; a silent " +
        "drop would shift every replicate and the interval would not " +
        "cover it")
    val dec = DecimalType(18, scale)
    val u = Sampling.bucketLong(
      concat(col("__b").cast("string"), lit(":"), col("__id")), seed)
    val reps = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .select(col("__b"), weightOf(u).as("__w"), col("__v"))
      .groupBy(col("__b"))
      .agg(sum(col("__w")).as("__n"),
        sum(col("__w") * col("__v").cast(dec)).as("__s"))
      // an all-zero-weight replicate has no mean; n must be tiny for
      // that to happen (P ≈ e^-n per replicate) — refuse loudly rather
      // than emit a NULL order statistic
      .select(col("__b"), col("__n"), col("__s"))
    val empty = reps.filter(col("__n") === 0).limit(1).collect()
    require(empty.isEmpty,
      "meanCI: a replicate drew zero total weight — the corpus is too " +
        "small to bootstrap (n in the single digits); report the plain " +
        "mean instead")
    val means = reps.select(
      round(col("__s").cast("double") / col("__n") * 1e6).cast("long")
        .as("__m"))
    val loIdx = ((alphaMicro * replicates + 999999L) / 1000000L).max(1L)
    val hiIdx = (((1000000L - alphaMicro) * replicates + 999999L)
      / 1000000L).min(replicates.toLong)
    val ordered = means.select(col("__m"),
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__m")))
        .as("__r"))
    val lo = ordered.filter(col("__r") === loIdx)
      .select(col("__m").as("lo_micro"))
    val hi = ordered.filter(col("__r") === hiIdx)
      .select(col("__m").as("hi_micro"))
    val overall = base.agg(count(lit(1)).as("n"),
      round(sum(col("__v").cast(dec)).cast("double") / count(lit(1)) * 1e6)
        .cast("long").as("mean_micro"))
    overall.select(col("n"), lit(replicates).as("replicates"),
        col("mean_micro"))
      .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
  }
}
