package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling, splitting and mixing (SURVEY.md §2.9).
  *
  * The reference pipeline materializes fixed dataset snapshots between DAG
  * tasks (README.md:48-171); at training-data scale the analogous needs are
  * "take a reproducible p% of 100 TB", "assign every document to
  * train/val/test once and forever", and "mix corpora at fixed per-source
  * rates". All three are implemented as *pure hash filters on a key column*:
  *
  *   keep(row)  ⇔  first 8 hex chars of md5(seed ‖ ":" ‖ key)  <  threshold
  *
  * Properties that matter at scale:
  *   - map-only: no shuffle, no state, no RNG — the filter fuses into the
  *     parquet scan and survives any re-partitioning, retry or speculative
  *     re-execution with the identical decision per row (a `rand()` sample
  *     changes under retries; this never does);
  *   - composable: a row's split assignment is independent of which machines
  *     scanned it, of the corpus size, and of every other row — adding data
  *     never reassigns existing documents (the property frozen-eval-set
  *     hygiene depends on);
  *   - engine-portable: md5 of the decimal string of the key is identical in
  *     every engine, so the sample is reproducible outside Spark too (the
  *     DuckDB oracles replay it verbatim).
  *
  * The 8-hex-char prefix is a uniform 32-bit integer; `rate` maps to the
  * lexicographic threshold floor(rate·2³²) in hex, so the realized fraction
  * is exact to 2⁻³² of the key space.
  *
  * Relation to [[Ops.RichDf.hashSample]]: that is the in-Spark xxhash64
  * variant (faster hash, codegen-native). This module trades a few ns/row
  * for md5's universal availability, and adds the split/mix/per-group
  * shapes on top.
  */
object Sampling {

  /** floor(rate·2³²) as 8 lowercase hex digits — the lexicographic cutoff
    * selecting a `rate` fraction of the md5-prefix space. Callers handle
    * rate ≤ 0 / ≥ 1 (the 9-digit "100000000" would compare wrongly). */
  private[graft] def hexThreshold(rate: Double): String = {
    require(rate > 0 && rate < 1, s"threshold needs rate in (0,1), got $rate")
    f"${math.floor(rate * 4294967296.0).toLong}%08x"
  }

  /** Uniform hash bucket of a key: first 8 md5 hex chars of "seed:key".
    * Distinct seeds give independent decisions over the same keys (sampling
    * at 10% twice with two seeds overlaps at ~1%, not 10%). */
  private def bucket(key: Column, seed: String): Column =
    substring(md5(concat(lit(seed), lit(":"), key.cast("string"))), 1, 8)

  /** Keep-predicate for one rate — constant-folds at the boundaries. */
  private def keepCond(key: Column, rate: Double, seed: String): Column =
    if (rate <= 0) lit(false)
    else if (rate >= 1) lit(true)
    else bucket(key, seed) < lit(hexThreshold(rate))

  /** Reproducible `rate`-fraction sample keyed on `key`. Map-only.
    * NULL keys have no hash bucket: the predicate is null and the row is
    * dropped at any rate < 1 (a silent rate-dependent drop would be worse;
    * filter or coalesce null keys upstream if they must be kept). */
  def sampleByHash(df: DataFrame, key: Column, rate: Double,
      seed: String = ""): DataFrame =
    df.filter(keepCond(key, rate, seed))

  /** Assign every row to one of `splits` = (name, weight) by cumulative
    * hash threshold; weights are normalized, the last split takes the
    * remainder of the hash space so assignment is total. Adds `outCol`.
    * Map-only; a row's split never changes as the corpus grows. */
  def assignSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
      seed: String = "", outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplit needs at least one split")
    require(splits.forall(_._2 >= 0) && splits.map(_._2).sum > 0,
      s"split weights must be non-negative with a positive sum: $splits")
    val total = splits.map(_._2).sum
    // cumulative upper bounds for all but the last split (which is `else`)
    val cum = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail.init
    val b = bucket(key, seed)
    val assign = splits.init.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) =>
        if (hi <= 0) rest // zero-weight split: unreachable branch, skip it
        else if (hi >= 1) lit(name)
        else when(b < lit(hexThreshold(hi)), name).otherwise(rest)
    }
    // a NULL key has no bucket: every `b < t` is null, so the when-chain
    // would silently fall through to the LAST split — assign null instead
    // and let the caller decide (consistent with sampleByHash dropping)
    df.withColumn(outCol, when(key.isNull, lit(null: String)).otherwise(assign))
  }

  /** Weighted corpus mixing: keep each row with its source's rate
    * (`rates`; sources not listed get `defaultRate`). The per-source rate
    * table is bounded configuration (a corpus list), so it compiles to a
    * literal CASE chain inside whole-stage codegen — no join, no shuffle.
    * For an unbounded/data-driven rate table, broadcast-join a rates frame
    * instead; this signature is the config-file shape the reference's
    * declarative task specs use. */
  def mixBySource(df: DataFrame, source: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: String = ""): DataFrame = {
    val cond = rates.toSeq.sortBy(_._1)
      .foldRight(keepCond(key, defaultRate, seed)) {
        case ((src, rate), rest) =>
          when(source === lit(src), keepCond(key, rate, seed)).otherwise(rest)
      }
    df.filter(cond)
  }

  /** Exactly min(k, |group|) rows per group, chosen by hash order of `key`
    * — a deterministic per-group reservoir sample (same contract as
    * Ops.capGroupSize, but sampling is the *goal* here, so the window always
    * runs and nothing is logged). One shuffle on the group key; the window
    * is linear per group. Groups too large for one task are the capGroupSize
    * pathology — sample those with `sampleByHash` first. */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int, seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__rn"),
      "sampleKPerGroup reserves column name __rn; rename it first")
    val ord = md5(concat(lit(seed), lit(":"), key.cast("string")))
    val w = Window.partitionBy(groupCols.map(col): _*)
      // tie-break on the key itself: duplicate keys share a hash, and a
      // nondeterministic row_number would change the sample across retries
      .orderBy(ord, key.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** The md5-prefix bucket as a uniform 32-bit integer (0 ≤ h < 2³²) —
    * the numeric face of [[bucket]] for rate thresholds that are computed
    * in-plan rather than folded into a hex literal. */
  private[graft] def bucketLong(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), lit(":"), key.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Weighted sample of k rows WITHOUT replacement (Efraimidis & Spirakis
    * 2006, "Weighted random sampling with a reservoir"): each row draws
    * u ~ U(0,1) from its key hash and is ranked by ln(u)/w — the top-k set
    * has exactly the WRS-without-replacement distribution, so a row's
    * inclusion odds scale with its weight (importance-weighted corpus
    * selection: sample by quality score, document length, dedup-cluster
    * mass, ...).
    *
    * Scale shape: map-only priority computation fused into the scan, then
    * one TakeOrderedAndProject — every partition keeps a k-row heap and the
    * driver merges P·k rows; no shuffle of the corpus, no RNG (u is a pure
    * hash of the key, so the sample is identical under retries and
    * re-partitioning, and replayable in any engine with md5 — the DuckDB
    * oracle re-derives it).
    *
    * u = (h + 0.5)/2³² with h the 32-bit md5 prefix: exactly representable
    * in a double and never 0 or 1, so ln(u) is always finite and the
    * priority is total. Rows with NULL or non-positive weight are dropped
    * (they have no defined sampling odds); pass a coalesced weight to keep
    * them at a floor rate. Ties (identical priority AND key string — i.e.
    * duplicate keys) break on the key to stay retry-deterministic.
    *
    * Cross-engine caveat: ln is a libm transcendental, correctly rounded
    * in neither the JVM nor DuckDB — two engines can disagree on a
    * priority's last ulp, which flips the selected SET only when the k-th
    * and (k+1)-th priorities are within ~1e-16 of each other (hash-
    * collision-scale odds; the md5-derived u values themselves are exact
    * on both sides). */
  def weightedSampleK(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__pri"),
      "weightedSampleK reserves column name __pri; rename it first")
    val u = (bucketLong(key, seed) + lit(0.5)) / lit(4294967296.0)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__pri", log(u) / weight.cast("double"))
      .orderBy(col("__pri").desc, key.cast("string"))
      .limit(k)
      .drop("__pri")
  }

  /** Temperature-based corpus rebalancing (the multilingual-mixing rule of
    * mC4/XLM-R: target share ∝ n^α): downsample each group so the kept
    * counts approach n_g^α. Keep rate r_g = (n_g / n_min)^(α−1) — the
    * smallest group keeps everything, larger groups are downsampled toward
    * the flattened distribution; α = 1 keeps everything, α → 0 equalizes
    * group sizes.
    *
    * Two passes, both scale-safe: one aggregation producing a groups-sized
    * rate table (O(|groups|), broadcast back), then a map-only hash filter
    * h < floor(r_g·2³²) identical in kind to [[sampleByHash]] — the
    * decision is a pure function of (seed, key, group rate), deterministic
    * under retries and replayable by the oracle. NULL group or key rows are
    * dropped (no defined rate/bucket, same convention as sampleByHash).
    *
    * Cross-engine caveat: pow is a libm transcendental, so two engines can
    * disagree on a rate's last ulp; after ·2³² and floor that moves the
    * cutoff by one only when the true rate sits within ~1e-16 of a 1/2³²
    * grid line, and even then it flips only keys hashing EXACTLY onto the
    * disputed cutoff — hash-collision-scale odds per group. */
  def rebalanceByTemperature(df: DataFrame, group: Column, key: Column,
      alpha: Double, seed: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    if (alpha == 1.0) return df.filter(group.isNotNull && key.isNotNull)
    val reserved = Seq("__grp", "__keep_max").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"${reserved.mkString(", ")} reserved by rebalanceByTemperature; rename first")
    val counts = df.filter(group.isNotNull)
      .groupBy(group.as("__grp")).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    // floor(r·2³²) as the integer cutoff; r = 1 gives 2³² which every
    // 32-bit hash is below, so the smallest group is kept in full
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col("__grp"),
        floor(pow(col("__n").cast("double") / col("__n_min"), alpha - 1)
          * lit(4294967296.0)).as("__keep_max"))
    df.join(broadcast(rates), group === col("__grp"))
      .filter(bucketLong(key, seed) < col("__keep_max"))
      .drop("__grp", "__keep_max")
  }

  /** Deterministic up-sampling at a fractional repetition rate — the other
    * half of mixture control: high-value sources REPEAT in a training mix
    * (epoch factors like 2.5×), where [[rebalanceByTemperature]] and
    * [[mixBySource]] only sample DOWN. Every row emits ⌊rate⌋ copies plus
    * one more for the hash-selected frac(rate) fraction of keys, so the
    * realized multiplier is `rate` exact to 2⁻³² of the key space and every
    * decision is a pure function of (seed, key) — retry-stable and
    * oracle-replayable like the rest of this module. Rates below 1 degrade
    * to [[sampleByHash]] semantics (0 copies drops the row at explode).
    * Output adds `outCol` (0-based copy index) so downstream
    * shuffles/shards distinguish copies and the result is a well-defined
    * multiset with a total order. NULL keys emit exactly ⌊rate⌋ copies
    * (no hash bucket ⇒ never the fractional extra — the sampleByHash null
    * convention, applied to the fractional part only).
    *
    * Scale: map-only — copies is a per-row integer and the repetition is
    * `explode(sequence(...))`, fused into the scan; output volume grows by
    * design, nothing else does. */
  def upsampleByRate(df: DataFrame, key: Column, rate: Double,
      seed: String = "", outCol: String = "copy_idx"): DataFrame = {
    // finite + capped: a derived factor that divided by zero (Infinity/NaN)
    // would pass a bare positivity check, saturate floor().toLong, and
    // either overflow mid-job (ANSI) or wrap negative so the zero-copy
    // guard silently emits NOTHING — the source would vanish from the mix
    // with no error. No sane epoch factor exceeds 10⁶.
    require(!rate.isNaN && !rate.isInfinite && rate > 0 && rate <= 1e6,
      s"rate must be a finite value in (0, 1e6], got $rate")
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists; pass a different name")
    val whole = math.floor(rate).toLong
    val frac = rate - whole
    val copies =
      if (frac == 0) lit(whole)
      else lit(whole) + when(keepCond(key, frac, seed), lit(1L)).otherwise(lit(0L))
    // guard: sequence(0, -1) is a DESCENDING sequence in Spark, not empty —
    // zero-copy rows must yield an empty array so explode drops them
    val idxs = when(copies <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), copies - 1))
    df.withColumn(outCol, explode(idxs))
  }

  /** Dedup-aware (leakage-safe) split assignment: like [[assignSplit]] but
    * keyed on the CANONICALIZED text — every copy of a duplicated document
    * (exact or formatting-variant, per
    * [[graft.text.TextStats.normalizeForDedup]]) hashes identically and
    * lands in the SAME split. Splitting on a row id instead silently leaks
    * train text into eval whenever the corpus still contains duplicates —
    * the benchmark-contamination failure mode this exists to close; run it
    * even after dedup (dedup caps miss pathological clusters by design).
    * Still map-only: the canonicalization is a codegen'd regex chain fused
    * into the scan. NULL text canonicalizes to "" and is assigned (all
    * null/empty docs co-locate — they are literal duplicates of each other),
    * unlike [[assignSplit]]'s NULL-key-null-split contract. */
  def assignSplitByContent(df: DataFrame, text: Column,
      splits: Seq[(String, Double)], seed: String = "",
      outCol: String = "split"): DataFrame =
    assignSplit(df, graft.text.TextStats.normalizeForDedup(text), splits,
      seed, outCol)

  /** X52 — deterministic in-corpus negative sampling: `k` random
    * non-matching documents per anchor, the pair-construction step for
    * contrastive training (retrievers, embedding models) where every
    * (anchor, positive) needs negatives drawn uniformly-ish from the
    * corpus.
    *
    * Mechanics: candidates hash into `buckets` buckets; each bucket
    * elects a head and a runner-up under the md5 order (ONE keyed window
    * over the candidate ids — never a global ranking); each anchor's j-th
    * draw hashes (anchor, j) to a bucket and takes its head — or the
    * runner-up when the head IS the anchor, so `neg_id ≠ anchor` is
    * structural, not probabilistic. The representative table is
    * buckets-sized and broadcasts, so the anchor side never shuffles:
    * the whole operator is one keyed window + one map-side join at any
    * corpus size. No RNG anywhere — every draw is a pure md5 function of
    * (seed, anchor, j), so retries, re-partitionings and the DuckDB
    * oracle all select the same negatives.
    *
    * Contract notes: draws are independent across j (two draws may land
    * the same negative — sampling with replacement across draws, the
    * in-batch-negatives convention); a draw yields NO row when its bucket
    * holds only the anchor itself (singleton-bucket edge; size `buckets`
    * well below the corpus so buckets hold many candidates). Negatives
    * are shared across anchors hitting the same bucket — the standard
    * shared-negatives regime. NULL anchor ids are dropped with the
    * [[sampleByHash]] null-key rationale. */
  def negativeSamples(corpus: DataFrame, idCol: String, k: Int,
      buckets: Int = 1024, seed: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    require(corpus.columns.contains(idCol), s"no column '$idCol' in corpus")
    val id = col(idCol)
    // distinct: a duplicated candidate id would elect itself as BOTH head
    // and runner-up of its bucket (identical ordering keys), and the
    // runner-up fallback below would then return the anchor as its own
    // negative — the structural guarantee must not depend on input
    // uniqueness. Candidate ids are one column; the distinct is cheap.
    val bucketed = corpus.select(id.as("__cid")).filter(col("__cid").isNotNull)
      .distinct()
      .withColumn("__b",
        pmod(bucketLong(col("__cid"), seed + ":b"), lit(buckets.toLong)))
    val w = Window.partitionBy(col("__b"))
      .orderBy(md5(concat(lit(seed), lit(":o:"), col("__cid").cast("string"))),
        col("__cid").cast("string"))
    val reps = bucketed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col("__b"))
      .agg(max(when(col("__rn") === 1, col("__cid"))).as("__c1"),
        max(when(col("__rn") === 2, col("__cid"))).as("__c2"))
    val anchors = corpus.select(id).filter(id.isNotNull)
      .withColumn("__j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__b", pmod(
        bucketLong(concat(id.cast("string"), lit("#"), col("__j")), seed + ":p"),
        lit(buckets.toLong)))
    anchors.join(broadcast(reps), Seq("__b"))
      .select(id, col("__j").as("neg_idx"),
        when(col("__c1") =!= id, col("__c1")).otherwise(col("__c2")).as("neg_id"))
      .filter(col("neg_id").isNotNull)
  }

  /** X71 — DoReMi domain mixture weights (Xie et al. NeurIPS'23, the
    * multiplicative-weights / Group-DRO reweighting step): given a
    * per-document excess loss (how much worse than the reference a domain
    * trains — negative values clip to 0, the paper's rule), compute the
    * training mixture that up-weights lagging domains. Per round:
    * w_d ← normalize(w_d · exp(η · L̄_d)); the released α_d is the
    * AVERAGE of the iterates (the paper's α̅, stabler than the last
    * round). The loop runs on the D-row domain table DRIVER-side — D is
    * domain cardinality (sources/languages, tens), so iterating there is
    * the honest plan at any corpus scale; the corpus itself is touched by
    * exactly ONE aggregation (count + decimal-exact loss sum per domain),
    * and that is the only thing that grows at 100 TB.
    *
    * All post-aggregation arithmetic is fixed-point integer micros:
    * weights sum to ≤ Micro (floor-division renormalization each round —
    * deficit < D µ), the one float (exp) is re-pinned to micros per
    * round, and every floor division runs on non-negative dividends, so
    * truncating and flooring division agree and any engine replays the
    * full T-round trajectory bit-for-bit from the per-domain means.
    * Output: (domain, n_docs, loss_micro, weight_micro, alpha_micro). */
  def doremiMixture(df: DataFrame, domain: Column, lossMicro: Column,
      rounds: Int = 5, lrMicro: Long = 200000L,
      maxDomains: Int = 10000): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    require(lrMicro > 0 && lrMicro <= Micro,
      s"lrMicro must be in (0, $Micro], got $lrMicro")
    val spark = df.sparkSession
    val perDomain = df.filter(domain.isNotNull)
      .groupBy(domain.as("__dom"))
      .agg(count(lit(1)).as("__n"),
        sum(greatest(lossMicro, lit(0L)).cast("long")).as("__sum"))
      .orderBy("__dom")
      .collect()
    require(perDomain.nonEmpty, "doremiMixture: no non-null domains")
    require(perDomain.length <= maxDomains,
      s"${perDomain.length} domains exceed maxDomains=$maxDomains — " +
        "a 'domain' with row-like cardinality is a key, not a mixture axis")
    val doms = perDomain.map(_.get(0))
    val n = perDomain.map(_.getLong(1))
    // mean excess loss in micros; sum and count are non-negative → floor
    val meanL = perDomain.map(r => r.getLong(2) / r.getLong(1))
    // η·L̄ ≤ 15 keeps factor ≤ 3.3e12 and w·factor ≤ 3.3e18 < Long.Max —
    // and an excess loss of 15/η nats is already far past any real run.
    // Division form: the product lrMicro·l itself can wrap Long for huge
    // means, which would slip a wrapped negative past a product-form check
    meanL.foreach(l => require(l <= 15000000000000L / lrMicro,
      s"η·L̄ = ${lrMicro}µ·${l}µ exceeds the exp(15) fixed-point range — " +
        "scale lossMicro down or lower lrMicro"))
    val d = doms.length
    var w = Array.fill(d)(Micro / d)
    val alphaSum = Array.fill(d)(0L)
    for (_ <- 1 to rounds) {
      // factor = exp(η·L̄) in micros; η·L̄ ≤ 1e6·1e9 → the double divide
      // is the ONE float, identical in any engine (a single Math.exp)
      val raw = Array.tabulate(d) { i =>
        val factor =
          math.round(math.exp((lrMicro * meanL(i)).toDouble / 1e12) * Micro)
        w(i) * factor / Micro
      }
      val s = raw.sum
      w = raw.map(r => r * Micro / s)
      for (i <- 0 until d) alphaSum(i) += w(i)
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("domain",
        perDomain.head.schema("__dom").dataType),
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("loss_micro",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("weight_micro",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("alpha_micro",
        org.apache.spark.sql.types.LongType)))
    val rows = (0 until d).map(i => org.apache.spark.sql.Row(
      doms(i), n(i), meanL(i), w(i), alphaSum(i) / rounds))
    spark.createDataFrame(rows.asJava, schema)
  }

  private val Micro = 1000000L

  /** X85 — stratified k-fold cross-validation assignment: every key gets
    * a fold in 0..k−1 such that WITHIN each stratum the fold sizes differ
    * by at most one — exact balance, not the ±√n drift a plain
    * `hash mod k` gives (on a 1%-positive stratum that drift is the
    * difference between a usable validation fold and an empty one).
    * Stratification is the published CV discipline for imbalanced labels
    * (Kohavi IJCAI'95); the key-granular assignment keeps it
    * LEAKAGE-SAFE the way [[assignSplitByContent]] is: all rows of one
    * key land in one fold, so duplicated documents can never sit in a
    * train fold and its validation complement at once.
    *
    * Mechanics: the distinct (stratum, key) frame ranks within its
    * stratum by (md5(seed:key), key) — the house hash order, so the
    * shuffle that lands in each fold is deterministic, engine-replayable,
    * and independent of row order — and fold = (rank−1) mod k; rows join
    * their key's fold back on (stratum, key). A key straddling TWO
    * strata cannot satisfy both contracts (one fold per key vs exact
    * per-stratum balance) and is REFUSED by a bounded probe rather than
    * silently breaking one of them — deduplicate or re-stratify upstream.
    * NULL keys get a NULL fold (the [[assignSplit]] stance); a NULL
    * stratum is a valid stratum like any other group.
    *
    * Scale shape: one distinct over (stratum, key) — key-sized, not
    * row-sized — one per-stratum window rank (the X51 per-group sort:
    * strata are label/language-sized, so per-partition sorts are bounded
    * by the largest stratum's KEY count), one keyed join back. No driver
    * state. */
  def kFoldAssign(df: DataFrame, key: Column, strata: Seq[String], k: Int,
      seed: String = "", outCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(strata.nonEmpty, "kFoldAssign needs at least one stratum column" +
      " — for unstratified folds pass a constant column")
    // the fold frame joins back onto df: its column names (outCol plus the
    // internal stratum/key carriers) must not already exist or the join
    // output turns ambiguous — the gapFill/rollingOutliers reserved-name
    // stance
    (Seq(outCol, "__fk") ++ strata.indices.map(i => s"__s$i"))
      .foreach(c => require(!df.columns.contains(c),
        s"column name $c is reserved by kFoldAssign — rename it upstream"))
    val keys = df.select(strata.map(col) :+ key.as("__key"): _*)
      .filter(col("__key").isNotNull).distinct()
    val straddle = keys.groupBy("__key")
      .agg(count(lit(1)).as("__ns")).filter(col("__ns") > 1).limit(1).collect()
    require(straddle.isEmpty,
      s"key '${straddle.headOption.map(_.get(0)).orNull}' appears in " +
        "multiple strata — one fold per key and exact per-stratum balance " +
        "cannot both hold; deduplicate or re-stratify upstream")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(substring(md5(concat(lit(seed), lit(":"),
        col("__key").cast("string"))), 1, 8), col("__key"))
    val folds = keys.withColumn(outCol,
      ((row_number().over(w) - 1) % k).cast("int"))
      .select(strata.zipWithIndex.map { case (s, i) => col(s).as(s"__s$i") } :+
        col("__key").as("__fk") :+ col(outCol): _*)
    // null-safe stratum equality: a NULL stratum is a real group and must
    // join its fold back like any other
    val cond = strata.zipWithIndex
      .map { case (s, i) => df(s) <=> folds(s"__s$i") }
      .foldLeft(key === folds("__fk"))(_ && _)
    df.join(folds, cond, "left")
      .drop(strata.indices.map(i => s"__s$i") :+ "__fk": _*)
  }
}
