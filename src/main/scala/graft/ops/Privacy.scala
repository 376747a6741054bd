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
  * enough to re-identify someone, (b) to DROP the rows those combinations
  * expose, and (c) to publish aggregate statistics whose release doesn't
  * leak membership. These three are that surface, kept deliberately
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
}
