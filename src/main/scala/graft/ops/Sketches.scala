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

  // -------------------------------------------------------------------
  // Count-min frequency sketch — the FREQUENCY member of the mergeable
  // trio (HLL = distinct, KLL = quantiles, CMS = per-key counts): "how
  // often did key k appear across all batches" without storing per-key
  // counters for an unbounded key domain (heavy-hitter detection over
  // n-grams, URLs, user ids). depth × width bucket counters; estimate =
  // min over the depth rows of the probed bucket — NEVER an undercount,
  // overcounts by collision mass ≤ ‖f‖₁·e/width with prob 1−e^−depth
  // (Cormode & Muthukrishnan 2005, "An improved data stream summary: the
  // count-min sketch and its applications", J.Algorithms 55(1) §4).
  //
  // Buckets come from the same engine-portable md5-prefix hash the
  // sampling family uses (row d probes bucket md5("seed:d:key")), so
  // unlike the binary HLL/KLL sketches the WHOLE structure is replayable
  // in any engine with md5 — the q131 DuckDB oracle rebuilds the sketch
  // and replays every estimate exactly, not just within a bound.
  //
  // Scale shape: one scan, rows × depth exploded pairs collapsed by
  // map-side partial aggregation — the shuffle carries at most
  // depth × width rows PER PARTITION, the output at most depth × width
  // rows total, corpus-size-independent. Merging sketches = summing
  // counters per (d, b): CMS is linear, so merge-then-estimate equals
  // estimate-over-union by construction. Estimation broadcasts the
  // (bounded) sketch and is map-only over the probe side.

  /** The depth-`d` bucket of `key`: first 8 md5 hex chars of "seed:d:key"
    * as a uniform 32-bit int, mod `width`. Shared by build and probe —
    * the two MUST agree or estimates are garbage. */
  private def cmsBucket(key: Column, d: Int, width: Int, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:$d:"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % width

  /** Build a count-min sketch of `key` over `df`: one row per touched
    * (d, b) counter — `(d, b, cnt)`, at most depth × width rows (untouched
    * counters are implicitly 0; [[freqEstimate]] coalesces). Sketch each
    * batch once, persist the rows next to it, merge across batches with
    * [[mergeFreqSketches]]. NULL keys are dropped (no hash bucket — the
    * [[graft.ops.Sampling]] contract). (depth, width, seed) are the
    * sketch's identity: estimates are only valid against a sketch built
    * with the same three. */
  def freqSketch(df: DataFrame, key: Column, depth: Int = 4, width: Int = 1024,
      seed: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.filter(key.isNotNull)
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(key, d, width, seed).as("b"))): _*))
        .as("layer"))
      .groupBy(col("layer.d").as("d"), col("layer.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge any union of [[freqSketch]] outputs (same depth/width/seed) back
    * to one sketch: counters sum — CMS is linear, the merged sketch is
    * EXACTLY the sketch of the concatenated batches. */
  def mergeFreqSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("d"), col("b")).agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates: one row `(probeKey, est)` per distinct
    * non-null probe key, `est` = min over depth of the probed counter
    * (0 for never-touched buckets). Guaranteed est >= true count; the
    * sketch side is bounded (≤ depth × width rows) and broadcast, so the
    * probe side — which may be corpus-sized — never shuffles for the
    * lookup; the only shuffle is the per-key min, carrying one row per
    * probe key after map-side partials. Must be called with the
    * (depth, width, seed) the sketch was built with. */
  def freqEstimate(sketch: DataFrame, probes: DataFrame, probeKey: String,
      depth: Int = 4, width: Int = 1024, seed: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    require(probes.columns.contains(probeKey),
      s"probe frame has no column '$probeKey'")
    probes.select(col(probeKey)).filter(col(probeKey).isNotNull).distinct()
      .select(col(probeKey), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(col(probeKey), d, width, seed).as("b"))): _*))
        .as("layer"))
      .select(col(probeKey), col("layer.d").as("d"), col("layer.b").as("b"))
      .join(broadcast(sketch), Seq("d", "b"), "left")
      .groupBy(col(probeKey))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ------------------------------------------------------------------
  // X89 — Bloom membership filter (Bloom CACM'70), the MEMBERSHIP member
  // of the mergeable sketch family (X27 distinct/quantile, X31 frequency,
  // X39 overlap): "might this key be in the set" with zero false
  // negatives — the primitive behind decontamination pre-filters ("was
  // this document's hash in the eval set's filter?"), blocklist pushdown,
  // and the runtime join pruning X49 delegates to Spark's opaque
  // bloom_filter_agg. This one is ROW-FORM — the sketch is its set bit
  // positions, `(pos)` — so it shares the family's two defining
  // properties: merge = set union of rows (a Bloom filter merges by
  // bitwise OR, and the union of position sets IS that OR — linear, so
  // merge-then-probe ≡ probe-over-union exactly), and md5-prefix hashing
  // makes the WHOLE structure engine-replayable (the oracle rebuilds the
  // filter and replays every probe, not just a rate bound).
  //
  // Scale shape: build explodes `hashes` positions per key and collapses
  // by map-side-combined distinct — the shuffle carries ≤ bits rows per
  // partition, the sketch ≤ min(n·hashes, bits) rows total,
  // corpus-size-independent. Probing broadcasts the bounded sketch; the
  // probe side — corpus-sized — never shuffles for the lookup (one
  // per-key membership aggregation after the map-side join). Row form is
  // the right layout up to bits ≈ 1e8; past that, pack the positions
  // into a long[] with a typed Aggregator (the X27 stance) — the
  // semantics here are layout-independent.
  //
  // FPR ≈ (1 − e^{−hashes·n/bits})^hashes; pick bits ≈ 10·n and
  // hashes = 7 for ~1%. (bits, hashes, seed) are the filter's identity —
  // probes against a filter built with different parameters are garbage,
  // same contract as CMS.

  /** Hash-`i` bit position of `key`: md5("seed:i:key") prefix mod bits.
    * Shared by build and probe — the two MUST agree. `private[ops]` so
    * the X119 file-skipping index builds IDENTICAL positions (one bit
    * function across the whole Bloom family, one oracle replay recipe). */
  private[ops] def bloomPos(key: Column, i: Int, bits: Int, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:$i:"), key.cast("string"))), 1, 15),
      16, 10).cast("long") % bits

  /** Build the filter over `df`'s non-null keys: one row per SET bit,
    * `(pos)`. NULL keys are dropped (no hash — the Sampling contract). */
  def bloomSketch(df: DataFrame, key: Column, bits: Int = 1 << 20,
      hashes: Int = 7, seed: String = "bloom"): DataFrame = {
    require(bits >= 2 && bits <= 100000000,
      s"bits must be in [2, 1e8] for the row layout, got $bits")
    require(hashes >= 1 && hashes <= 16, s"hashes must be in [1,16], got $hashes")
    df.filter(key.isNotNull)
      .select(explode(array((0 until hashes).map(i =>
        bloomPos(key, i, bits, seed)): _*)).as("pos"))
      .distinct()
  }

  /** Merge any union of same-(bits, hashes, seed) filters: set union of
    * positions — EXACTLY the filter of the concatenated inputs. */
  def bloomMerge(sketches: DataFrame): DataFrame = sketches.distinct()

  /** Membership probe: one row `(probeKey, member)` per distinct non-null
    * probe key — `member` true iff ALL `hashes` positions are set. False
    * negatives are structurally impossible; false positives happen at
    * the design rate. The sketch broadcasts; the probe side never
    * shuffles for the lookup. */
  def bloomProbe(sketch: DataFrame, probes: DataFrame, probeKey: String,
      bits: Int = 1 << 20, hashes: Int = 7, seed: String = "bloom"): DataFrame = {
    require(probes.columns.contains(probeKey),
      s"probe frame has no column '$probeKey'")
    probes.select(col(probeKey)).filter(col(probeKey).isNotNull).distinct()
      .select(col(probeKey), explode(array((0 until hashes).map(i =>
        bloomPos(col(probeKey), i, bits, seed)): _*)).as("pos"))
      .join(broadcast(sketch.select(col("pos"), lit(true).as("__hit"))),
        Seq("pos"), "left")
      .groupBy(col(probeKey))
      .agg((count(lit(1)) === sum(when(col("__hit"), 1L).otherwise(0L)))
        .as("member"))
  }

  /** X39's 60-bit key hash: first 15 md5 hex chars as a non-negative long.
    * 15 hex chars (not 16) keeps the value inside the positive signed-64
    * range, so Spark's LongType and an external engine's UBIGINT order
    * values identically — and ordering is the WHOLE semantics of KMV.
    * Collisions at 2^60 are ~k²/2^61 per sketch: irrelevant at k ≈ 10³. */
  private def kmvHash(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:"), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** X39 — KMV distinct sketch per group: the k smallest distinct key
    * hashes, one `(grp, hv)` row each (≤ k·8 B per group — the 100 TB
    * history state is a few KB per source). Built by a bounded typed
    * Aggregator ([[graft.functions.Aggregators.MinKDistinct]]): partial
    * aggregation collapses a group's keys into one ≤ k-long buffer before
    * anything shuffles — never a distinct-key shuffle, never collect_set.
    * NULL keys are dropped (no hash bucket — the Sampling contract).
    *
    * The rows ARE the mergeable artifact: [[kmvMergeSketches]] of any
    * union of batch sketches equals the sketch of the concatenated
    * batches (min-k over distinct is idempotent/commutative/associative),
    * and [[kmvJaccard]] estimates cross-group overlap from rows alone —
    * the cross-source contamination question answered without ever
    * joining the corpora. (k, seed) are the sketch's identity; estimates
    * are only valid between sketches built with the same pair. */
  def kmvSketch(df: DataFrame, group: Column, key: Column, k: Int = 64,
      seed: String = "kmv"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.filter(key.isNotNull)
      .select(group.as("grp"), kmvHash(key, seed).as("hv"))
      .groupBy(col("grp"))
      .agg(udaf(new graft.functions.Aggregators.MinKDistinct(k)).apply(col("hv"))
        .as("hvs"))
      .select(col("grp"), explode(col("hvs")).as("hv"))
  }

  /** Merge any union of [[kmvSketch]] outputs (same k/seed): re-apply
    * min-k per group — the merged rows are EXACTLY the sketch of the
    * concatenated batches. */
  def kmvMergeSketches(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    sketches.groupBy(col("grp"))
      .agg(udaf(new graft.functions.Aggregators.MinKDistinct(k)).apply(col("hv"))
        .as("hvs"))
      .select(col("grp"), explode(col("hvs")).as("hv"))
  }

  /** Pairwise Jaccard estimates between every pair of sketched groups,
    * from sketch rows ALONE (Beyer et al. SIGMOD'07): for a pair, keep the
    * k smallest distinct hashes of the UNION of the two sketches; the
    * estimate is the fraction of those that appear in both. When the two
    * groups together have fewer than k distinct keys the union sketch is
    * the union itself and the estimate is EXACT — the small-group
    * degeneracy is correctness, not error.
    *
    * Cost is sketch-sized, corpus-free: P groups → P·k input rows,
    * P(P−1)/2 pair frames of ≤ 2k rows. The per-pair window is bounded at
    * 2k rows — no single-task global window. Output
    * `(grp_a, grp_b, est_jaccard)` with grp_a < grp_b, round-6 double.
    *
    * `minSharedHashes > 0` guards the quadratic pair enumeration for LARGE
    * group counts (thousands of sources → millions of 2k-row pair
    * windows): candidate pairs then come from a hash-keyed SELF-JOIN of
    * the sketch rows — only pairs sharing ≥ `minSharedHashes` sketch
    * values are estimated, so the pair frame stays collision-sized instead
    * of P². Pairs below the floor are OMITTED from the output (they have
    * no evidence of overlap); any pair the unfiltered estimator would
    * score > 0 shares at least one sketch value, so at
    * `minSharedHashes = 1` every nonzero estimate survives with its value
    * UNCHANGED (SketchesSpec pins both properties) — what disappears are
    * the all-zero rows, which at scale are almost all of them. Higher
    * floors trade small-overlap recall for a smaller candidate set. */
  def kmvJaccard(sketches: DataFrame, k: Int,
      minSharedHashes: Int = 0): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minSharedHashes >= 0,
      s"minSharedHashes must be >= 0, got $minSharedHashes")
    val groups = sketches.select(col("grp")).distinct()
    val pairs =
      if (minSharedHashes > 0)
        // keyed on hv: each shared value joins once per pair (sketch rows
        // are distinct within a group), never a cross product
        sketches.select(col("grp").as("grp_a"), col("hv"))
          .join(sketches.select(col("grp").as("grp_b"), col("hv")), Seq("hv"))
          .filter(col("grp_a") < col("grp_b"))
          .groupBy(col("grp_a"), col("grp_b"))
          .agg(count(lit(1)).as("__shared"))
          .filter(col("__shared") >= minSharedHashes)
          .select(col("grp_a"), col("grp_b"))
      else broadcast(groups.select(col("grp").as("grp_a")))
        .crossJoin(broadcast(groups.select(col("grp").as("grp_b"))))
        .filter(col("grp_a") < col("grp_b"))
    val a = pairs.join(sketches.withColumnRenamed("grp", "grp_a"), Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("hv"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val b = pairs.join(sketches.withColumnRenamed("grp", "grp_b"), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("hv"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val union = a.unionByName(b)
      .groupBy(col("grp_a"), col("grp_b"), col("hv"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp_a"), col("grp_b")).orderBy(col("hv"))
    union.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(round(
        sum(col("in_a") * col("in_b")).cast("double") / count(lit(1)),
        6).as("est_jaccard"))
  }
}
