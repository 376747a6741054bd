package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy operators for training-data release: k-anonymity auditing and
  * suppression (Sweeney, IJUFKS 2002) and ε-differentially-private noisy
  * counts (Dwork et al., TCC 2006) with hash-derived — therefore
  * deterministic and oracle-replayable — Laplace noise.
  *
  * Training corpora routinely mix user-contributed records; before a slice
  * ships, the curator needs (a) to FIND quasi-identifier combinations rare
  * enough to re-identify someone, (b) to COARSEN those combinations along a
  * generalization ladder before (c) DROPPING the residue no coarsening
  * saves, and (d) to publish aggregate statistics whose release doesn't
  * leak membership. These faces are that surface, kept deliberately
  * engine-portable: every decision is a pure function of the row values
  * and a seed string, so the DuckDB oracle replays bit-compatible logic
  * and a retried Spark task cannot flip a decision.
  *
  * Scale notes (100 TB): the audit is one hash-aggregate over the QI
  * columns — group count, not row count, crosses the shuffle. Suppression
  * uses a window COUNT over the same QI partitioning, one shuffle total,
  * no join, no second scan. Noisy counts aggregate first (output is
  * groups-sized) and add noise in the reduced frame — the noise column is
  * O(|groups|) work regardless of input size. */
object Privacy {

  /** k-anonymity audit: one row per quasi-identifier combination with its
    * group size and whether it meets the k threshold. The classic release
    * gate: any `k_anonymous = false` row is a combination of "harmless"
    * attributes that singles out fewer than k individuals.
    *
    * NULL QI values form their own groups (NULL-safe struct grouping):
    * "unknown nation" is itself a quasi-identifier value an attacker can
    * match on, so lumping nulls together — not dropping them — is the
    * conservative choice. */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    val missing = qiCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"quasi-identifier columns absent: ${missing.mkString(", ")}")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("k_anonymous", col("group_size") >= k)
  }

  /** Minimal row suppression: keep exactly the rows whose QI combination
    * has at least k members. One window count over the QI partitioning —
    * the same single shuffle the audit pays, and unlike an
    * audit-then-semi-join it never rescans the input.
    *
    * The output IS k-anonymous on `qiCols` by construction: every
    * surviving combination retains its full original group, so no group
    * can shrink below k through the suppression itself. */
  def suppressBelowK(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    val missing = qiCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"quasi-identifier columns absent: ${missing.mkString(", ")}")
    require(!df.columns.contains("__qi_n"),
      "suppressBelowK reserves column name __qi_n; rename it first")
    val w = Window.partitionBy(qiCols.map(col): _*)
    df.withColumn("__qi_n", count(lit(1)).over(w))
      .filter(col("__qi_n") >= k)
      .drop("__qi_n")
  }

  /** Per-level k-anonymity audit across a GENERALIZATION ladder — the
    * instrument behind [[generalizeUntilK]], exposed because the release
    * decision should be inspectable (Sweeney 2002's
    * generalization-with-suppression, the Datafly family's evaluation
    * step). `levels` is the ladder: each entry binds every QI name to its
    * expression at that level — level 0 the identity, later levels
    * successively coarser (widen a numeric band, drop a column to `"*"`).
    * Returns one row per level: `(level, groups_below_k,
    * rows_suppressed)` — how many QI combinations still single out fewer
    * than k individuals, and how many rows suppression would cost there.
    *
    * Plan shape: ONE scan whatever the ladder length — each row explodes
    * into |levels| (level, qi-tuple) pairs, a hash aggregate counts
    * (level, tuple) groups, and a second groups-sized aggregate folds the
    * per-level summary. The alternative (one audit pass per level) scans
    * the table |levels| times; at 100 TB the explode's |levels|× shuffle
    * rows are groups-bounded after map-side combine, the scan is paid
    * once. QI values are compared as strings with the engine-portable
    * " null" sentinel (the [[dpNoisyCounts]] stance: NULL is itself a
    * quasi-identifier value). */
  def ladderAudit(df: DataFrame, levels: Seq[Seq[(String, Column)]],
      k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(levels.nonEmpty, "generalization ladder must have at least one level")
    val arity = levels.head.size
    require(arity > 0 && levels.forall(_.size == arity),
      "every ladder level must bind the same quasi-identifier set")
    val leveled = levels.zipWithIndex.map { case (exprs, i) =>
      struct(lit(i).as("lvl"),
        array(exprs.map { case (_, e) =>
          coalesce(e.cast("string"), lit(" null")) }: _*).as("qi"))
    }
    df.select(explode(array(leveled: _*)).as("__e"))
      .select(col("__e.lvl").as("level"), col("__e.qi").as("__qi"))
      .groupBy("level", "__qi").agg(count(lit(1)).as("__n"))
      .groupBy("level").agg(
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("rows_suppressed"))
  }

  /** Generalize-then-suppress release: audit the whole ladder
    * ([[ladderAudit]] — one scan), pick the LOWEST level achieving the
    * MINIMUM suppression residue, rewrite the QI columns to that level's
    * expressions, and suppress the remaining below-k rows
    * ([[suppressBelowK]]). Suppression is the blunt instrument; a
    * production release gate coarsens first — widening `band` or dropping
    * `nat` to `"*"` keeps the row (with less detail) where suppression
    * deletes it, so utility degrades gradually instead of rows vanishing.
    *
    * For a TRUE hierarchy (each level's groups are unions of the previous
    * level's) suppression is monotone non-increasing in level, so
    * "lowest level at the minimum" IS the first level reaching zero
    * residue when one exists — the classic walk — while degrading sanely
    * (least suppression, then least generalization) on ladders that never
    * reach zero. The level choice costs one bounded collect of
    * |levels| audit rows; the release itself adds the one window pass
    * suppressBelowK always pays. Output: the released rows with coarsened
    * QI columns (names preserved, non-QI columns untouched) plus
    * `gen_level`, the chosen level. */
  def generalizeUntilK(df: DataFrame, levels: Seq[Seq[(String, Column)]],
      k: Int): DataFrame = {
    val audit = ladderAudit(df, levels, k)
      .select(col("level"), col("rows_suppressed"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(audit.length == levels.size,
      s"audit returned ${audit.length} levels for ${levels.size} — empty input?")
    val chosen = audit.sortBy { case (l, s) => (s, l) }.head._1
    val exprs = levels(chosen)
    val names = exprs.map(_._1)
    val others = df.columns.filterNot(names.contains)
    val coarse = df.select(
      exprs.map { case (n, e) => e.as(n) } ++ others.map(col): _*)
    suppressBelowK(coarse, names, k).withColumn("gen_level", lit(chosen))
  }

  /** ε-DP noisy group counts via the Laplace mechanism: count(·) per group
    * plus Laplace(Δ/ε) noise, Δ = 1 for counting queries. The noise is
    * derived from the md5-uniform of `seed:group` through the standard
    * inverse-CDF transform
    *
    *   u ∈ (0,1),  noise = −(1/ε) · sign(u − ½) · ln(1 − 2·|u − ½|)
    *
    * with u = (h + ½)/2³² from [[Sampling]]'s md5 bucket — exactly the
    * Efraimidis-style hash-uniform the sampling family already replays in
    * DuckDB. Determinism is a deliberate trade: a FIXED seed makes the
    * release reproducible and testable (same noise every run — repeated
    * releases don't average the noise away, which is what ε-DP composition
    * requires of a single release), while rotating the seed is the caller's
    * explicit act of spending more privacy budget.
    *
    * SECURITY CONTRACT — the seed is a KEY, not a config knob. The noise
    * is a pure function of (seed, group key); the group keys are public in
    * the release itself, so anyone holding the seed recomputes
    * md5(seed:group), rebuilds the exact noise, and subtracts it back to
    * the true counts. ε-DP therefore holds ONLY against adversaries who do
    * not know the seed: keep it secret (secrets manager, not source
    * control) and never reuse it across releases of the same statistic
    * unless you intend them to carry identical noise. With a published
    * seed this method is a deterministic pseudo-noise release — useful for
    * testing and oracle replay, but NOT differential privacy. An empty
    * seed is refused outright: it is the one value nobody treats as a
    * secret. Two quantization caveats, both second-order next to seed
    * secrecy: u has 32-bit granularity, so the Laplace tail is truncated
    * at |noise| ≲ ln(2³²)/ε ≈ 22.2/ε, and each group's draw comes from one
    * md5 prefix rather than a cryptographic DRBG.
    *
    * Cross-engine caveat, same as weightedSampleK: ln is a libm
    * transcendental, so the last ulp can differ between engines; the
    * published value is rounded to 6 decimals, which disagrees only when
    * the true value sits within 1e-6-ulp of a rounding boundary.
    *
    * Groups whose group expression is NULL are kept as their own row
    * (NULL is a visible category of the release, same stance as the
    * audit); their hash key is the sentinel " null" (engine-portable —
    * DuckDB VARCHARs cannot carry a NUL byte, so a space prefix stands in)
    * so the NULL group gets real noise rather than a NULL noisy_n that
    * would leak its exact count. A genuine string group valued " null"
    * would share that noise draw — it still gets valid Laplace noise,
    * merely correlated with the NULL group's. */
  def dpNoisyCounts(df: DataFrame, group: Column, epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seed.nonEmpty,
      "dpNoisyCounts seed is the privacy key — it must be non-empty and " +
        "kept secret; see the SECURITY CONTRACT in the scaladoc")
    val counts = df.groupBy(group.as("grp")).agg(count(lit(1)).as("n"))
    val hashKey = coalesce(col("grp").cast("string"), lit(" null"))
    val u = (Sampling.bucketLong(hashKey, seed) + lit(0.5)) / lit(4294967296.0)
    val centered = u - lit(0.5)
    val noise = -lit(1.0 / epsilon) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts.select(col("grp"), col("n"),
      round(col("n") + noise, 6).as("noisy_n"))
  }

  /** X74 — ε-DP quantile release via the EXPONENTIAL MECHANISM (McSherry &
    * Talwar FOCS'07), sampled through the Gumbel-max trick — the standard
    * equivalence: adding independent Gumbel(0,1) noise to each candidate's
    * ε·u/2 score and taking the argmax draws EXACTLY the exponential
    * mechanism's distribution, which turns "sample ∝ exp(ε·u/2)" into one
    * deterministic, hash-replayable argmax (the [[graft.text.Dsir]]
    * Gumbel-top-k machinery pointed at privacy). Candidates are the
    * OBSERVED distinct values; utility u(v) = −|rank(v) − target|, rank
    * sensitivity 1 under add/remove — the discrete form of the DP-median
    * construction (Smith STOC'11 refines with interval weighting; the
    * discrete form keeps every quantity integer and engine-portable).
    *
    * Per-candidate noise is keyed on the candidate's RANK, not its value:
    * a double's string form is engine-formatting-dependent, a rank is a
    * plain integer both engines print identically — so the DuckDB oracle
    * replays the draw bit-compatibly. The SECURITY CONTRACT of
    * [[dpNoisyCounts]] applies verbatim: the seed is the privacy key;
    * with a published seed this is a deterministic pseudo-noise release
    * for testing and replay, not DP against a seed-holding adversary.
    *
    * Scale shape: one value-keyed count (map-side combinable; DISTINCT
    * values cross the shuffle, not rows), one running-count pass over the
    * distinct-value frame (domain-sized — for unbounded real-valued
    * domains bucket upstream first, which a sane DP release does anyway:
    * the mechanism's utility is per-candidate, so a 100 TB corpus with
    * billions of distinct raw doubles wants histogram bins as candidates),
    * then |quantiles| independent argmaxes off one broadcast-joined
    * explode. Output: one row per requested quantile, `(q_micro,
    * released)` — deliberately nothing else: the true rank or count of
    * the released value is itself private. */
  def dpQuantiles(df: DataFrame, value: Column, quantilesMicro: Seq[Long],
      epsilonMicro: Long, seed: String): DataFrame = {
    require(quantilesMicro.nonEmpty, "dpQuantiles needs at least one quantile")
    require(quantilesMicro.forall(q => q >= 0 && q <= 1000000L),
      s"quantiles are micros in [0, 1e6], got $quantilesMicro")
    require(quantilesMicro.distinct.size == quantilesMicro.size,
      s"duplicate quantiles: $quantilesMicro")
    require(epsilonMicro > 0 && epsilonMicro <= 100000000L,
      s"epsilonMicro must be in (0, 1e8], got $epsilonMicro")
    require(seed.nonEmpty,
      "dpQuantiles seed is the privacy key — it must be non-empty and " +
        "kept secret; see dpNoisyCounts' SECURITY CONTRACT")
    val counts = df.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("__c"))
    // rank(v) = rows strictly below v: running count over distinct values
    val ranked = counts.withColumn("__below",
      sum(col("__c")).over(Window.orderBy(col("v"))) - col("__c"))
    val tot = counts.agg(sum(col("__c")).as("__n"))
    val cand = ranked.crossJoin(broadcast(tot))
      .select(col("v"), col("__below"),
        explode(array(quantilesMicro.map(lit): _*)).as("q_micro"),
        col("__n"))
      // target rank ⌊(n−1)·q⌋ and HALVED penalty ε·|Δrank|/2, both as
      // floor divisions of NON-NEGATIVE dividends (negative floor vs
      // truncate would diverge between engines)
      .withColumn("__pen", expr(
        s"($epsilonMicro * abs(__below - ((__n - 1) * q_micro) DIV 1000000)) DIV 2"))
    val u = (Sampling.bucketLong(
      concat(col("q_micro").cast("string"), lit(":"),
        col("__below").cast("string")), seed) + lit(0.5)) / lit(4294967296.0)
    cand
      .withColumn("__pri",
        -col("__pen").cast("double") / lit(1e6) - log(-log(u)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("q_micro").orderBy(col("__pri").desc, col("v"))))
      .filter(col("__rn") === 1)
      .select(col("q_micro"), col("v").as("released"))
  }
}
