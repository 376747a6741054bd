package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark 4) — the incremental face of cardinality monitoring. Where
  * `approx_count_distinct` answers "how many distinct NOW, in one pass",
  * a STORED sketch answers it across batches: sketch each daily ingest
  * once (its own scan), persist the few-KB binary next to the batch, and
  * the distinct count of ANY union of batches is a sketch merge — no
  * re-scan of history, the same never-touch-history contract as
  * `Dedup.incrementalDedup` but for monitoring instead of filtering.
  *
  * Scale: sketching is one partial-aggregated pass (sketches merge
  * map-side, the shuffle carries lgK-sized buffers per group, never
  * values); merging unions group-count × few-KB binaries. Estimates carry
  * HLL error (~1.04/√2^lgK relative, ~1.6% at the default lgK=12) — use
  * exact `countDistinct` for correctness gates, sketches for dashboards
  * and drift alarms, the `Validate.uniqueApprox` division of labor.
  */
object Sketches {

  /** One HLL sketch of `value` per group: (groupCols..., sketch binary).
    * Store alongside the batch; re-derive never. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], value: Column,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    require(groupCols.nonEmpty, "distinctSketch needs at least one group column")
    require(!groupCols.contains("sketch"),
      "group column name 'sketch' is reserved by distinctSketch")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"))
  }

  /** Merge per-batch sketch rows back to one sketch per group — the
    * cross-batch union. Input: any union of [[distinctSketch]] outputs
    * (e.g. yesterday's table unioned with today's). `allowDifferentLgK`
    * tolerates mixed-precision sketches (the union downgrades to the
    * coarsest); keep one lgK fleet-wide when you can. */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch", allowDifferentLgK: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "mergeSketches needs at least one group column")
    require(!groupCols.contains(sketchCol),
      s"group column '$sketchCol' collides with the sketch column")
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(allowDifferentLgK)).as(sketchCol))
  }

  /** Distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** One KLL quantile sketch of a BIGINT `value` per group — the percentile
    * sibling of [[distinctSketch]] (Apache DataSketches KLL, built into
    * Spark 4): sketch each batch once, persist the few-KB binary, and any
    * union of batches answers ANY quantile by merging sketches — the
    * monitoring quantity (p50/p95/p99 length drift, latency SLOs) without
    * re-scanning history. `k` trades size for rank error (~1.65% at the
    * default k=200, the DataSketches default). Same partial-agg scale shape
    * as the HLL path: the shuffle carries k-sized buffers, never values.
    * KLL compaction is RANDOMIZED — two runs over identical data may differ
    * inside the rank-error band, so gates on sketch output must be
    * bound-flags against exact values (the q109/q120 contract), never
    * value-equality. */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int = 200): DataFrame = {
    require(k >= 8, s"k must be >= 8, got $k")
    require(groupCols.nonEmpty, "quantileSketch needs at least one group column")
    require(!groupCols.contains("qsketch"),
      "group column name 'qsketch' is reserved by quantileSketch")
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("kll_sketch_agg_bigint", value, lit(k)).as("qsketch"))
  }

  /** Merge per-batch KLL sketch rows back to one sketch per group — the
    * cross-batch union of [[quantileSketch]] outputs. */
  def mergeQuantileSketches(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "qsketch"): DataFrame = {
    require(groupCols.nonEmpty, "mergeQuantileSketches needs at least one group column")
    require(!groupCols.contains(sketchCol),
      s"group column '$sketchCol' collides with the sketch column")
    sketches.groupBy(groupCols.map(col): _*)
      .agg(call_function("kll_merge_agg_bigint", col(sketchCol)).as(sketchCol))
  }

  /** Quantile estimate (BIGINT domain) of a KLL sketch column at rank `q`. */
  def quantileEstimate(sketch: Column, q: Double): Column = {
    require(q >= 0 && q <= 1, s"rank must be in [0,1], got $q")
    call_function("kll_sketch_get_quantile_bigint", sketch, lit(q))
  }
}
