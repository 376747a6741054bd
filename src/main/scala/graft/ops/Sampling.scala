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
}
