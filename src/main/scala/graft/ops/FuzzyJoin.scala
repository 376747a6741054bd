package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string join — all (left, right) pairs with
  * Levenshtein distance ≤ `maxDist` — via *deletion-neighborhood blocking*
  * (FastSS: Bocek et al. 2007, "Fast Similarity Search in Large
  * Dictionaries"; the SymSpell index uses the same identity). The entity-
  * resolution workhorse the reference's SQL surface lacks: matching names,
  * titles, codes across tables that never agreed on a spelling.
  *
  * Identity that makes it a keyed join: if lev(s, t) ≤ d then deleting the
  * ≤ d edited positions from each side yields a COMMON string, i.e. the
  * ≤ d-deletion neighborhoods of s and t intersect. So:
  *   1. explode every row into its deletion variants (≤ `maxDist` chars
  *      removed — C(n, d) variants per n-char string, generated in-plan,
  *      no UDF);
  *   2. equi-join the two variant frames on the variant string — candidates
  *      are a superset of the answer, produced without a cross product;
  *   3. verify candidates with the exact thresholded `levenshtein` (Spark's
  *      early-exit form) — false positives never survive.
  *
  * Scale shape: shuffle is variants (rows × C(len, maxDist)), the join is
  * keyed, and a hot variant bucket (m left × k right members) is capped by
  * the same logged [[Ops.capGroupSize]] guard the LSH band joins use —
  * never a silent quadratic blowup. Intended for SHORT join keys (names,
  * titles, codes ≲ 64 chars) and maxDist 1-2; variant counts grow as
  * C(n, d), which is the known FastSS trade.
  *
  * Output: (left_id, right_id, dist), dist ≤ maxDist exact. A self-join
  * emits both orientations and the dist-0 diagonal; filter
  * `left_id < right_id` for unordered pairs.
  */
object FuzzyJoin {

  /** One-deletion expansion of `v`: the array of strings with the char at
    * each position removed (empty array for the empty string — `sequence`
    * would otherwise run DESCENDING from 1 to 0 and mint phantom variants). */
  private def deleteOne(v: Column): Column =
    when(length(v) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(v)), i =>
        concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v) - i))))

  /** (__id, __s, __v) — every variant of __s with 0 to `d` chars deleted.
    * Distinct per (__id, __v): deleting either duplicate char of "aa" gives
    * the same "a", and duplicate variants would multiply candidates. The
    * dedup is PER ROW — each level's variant set rides as one array,
    * `array_distinct`-ed in place, and explodes once at the end — so no
    * shuffle ever touches the variant fan-out (the former per-level
    * explode + global distinct shuffled rows × C(len, d) variant rows to
    * deduplicate what a ≤ C(len, d)-element in-row pass already can;
    * levels have distinct lengths, so the final cross-level distinct is
    * belt-and-braces, not load-bearing). */
  private def deletionVariants(df: DataFrame, id: Column, str: Column,
      d: Int): DataFrame = {
    // Spread rows before the C(len, d) explode: scan parallelism is
    // row-group-bounded, and the fan-out plus the downstream bucket
    // census/persist/join map sides all inherit the pre-explode
    // partitioning. Explicit count (defaultParallelism — the core count):
    // a count-less keyed repartition is AQE-coalescible right back to
    // the row-group partition count this exists to escape.
    // Distinct (__id, __s) BEFORE the explode: duplicate input rows would
    // each emit a full variant set, and those duplicates count against
    // maxVariantBucket in capGroupSize — the cap could fire (and
    // deterministically drop rows) on inputs where a deduped frame
    // wouldn't. The final candidate distinct only collapses the no-cap
    // case, so the dedup must happen here. Free of an extra Exchange:
    // hash-partitioning on __id already clusters (__id, __s).
    val base = df.select(id.as("__id"), str.as("__s"))
      .filter(col("__s").isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("__id"))
      .distinct()
    val levels = (1 to d).scanLeft(array(col("__s"))) { (prev, _) =>
      array_distinct(flatten(transform(prev, v => deleteOne(v))))
    }
    base.select(col("__id"), col("__s"),
      explode(array_distinct(concat(levels: _*))).as("__v"))
  }

  /** Deduplicated candidate pairs whose deletion neighborhoods intersect —
    * the shared FastSS blocking stage of [[fuzzyJoin]] and [[fuzzyJoinJw]]:
    * a SUPERSET of all pairs with lev ≤ maxDist, produced by a keyed join,
    * never a cross product. Columns: (__lid, __ls, __rid, __rs). */
  private def candidatePairs(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, maxVariantBucket: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3] (variant count grows as C(len, d)), got $maxDist")
    def capped(v: DataFrame, side: String): (DataFrame, Boolean) =
      if (maxVariantBucket > 0)
        Ops.capGroupSizeWithFlag(v, Seq("__v"), "__id", maxVariantBucket,
          s"fuzzyJoin.$side")
      else (v, false)
    val (lCapped, lWasCapped) =
      capped(deletionVariants(left, col(leftId), col(leftStr), maxDist), "left")
    // a self-join (the dedup shape) reuses the left side's variant frame —
    // capGroupSize persists it, so building and cap-counting it twice would
    // double both the explode work and the driver actions
    val selfJoin = (right eq left) && rightId == leftId && rightStr == leftStr
    val rCapped =
      if (selfJoin) lCapped
      else capped(deletionVariants(right, col(rightId), col(rightStr), maxDist),
        "right")._1
    val lv = lCapped.select(col("__id").as("__lid"), col("__s").as("__ls"), col("__v"))
    val rv = rCapped.select(col("__id").as("__rid"), col("__s").as("__rs"), col("__v"))
    val joined = lv.join(rv, "__v")
      .select(col("__lid"), col("__ls"), col("__rid"), col("__rs"))
    // A self-join's dist-0 diagonal is emitted DIRECTLY (one row per
    // distinct input row) instead of riding the variant join, where every
    // row proposes itself once per variant — C(len, d) duplicate
    // candidates per row for the candidate-distinct to collapse again.
    // Cap semantics preserved exactly: (i, i) is a candidate iff row i
    // survives in at least one bucket (both join sides are the same
    // frame), so when the cap actually FIRED the diagonal rebuilds from
    // the capped variant frame; in the healthy no-cap case (every row
    // survives, by definition) it comes straight from the input rows.
    val candidates =
      if (selfJoin) {
        val diagRows =
          if (lWasCapped) lCapped.select(col("__id"), col("__s")).distinct()
          else left.select(col(leftId).as("__id"), col(leftStr).as("__s"))
            .filter(col("__s").isNotNull)
        joined.filter(!(col("__lid") <=> col("__rid") &&
            col("__ls") <=> col("__rs"))).unionAll(
          diagRows.select(col("__id").as("__lid"), col("__s").as("__ls"),
            col("__id").as("__rid"), col("__s").as("__rs")))
      } else joined
    // candidates proposed by several shared variants collapse BEFORE the
    // (comparatively costly) verification stage
    candidates.distinct()
  }

  /** All pairs with lev(leftStr, rightStr) ≤ maxDist. `maxVariantBucket`
    * caps each variant bucket per side (deterministic smallest-id sample,
    * drop count logged — never silent; 0 disables). */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int,
      maxVariantBucket: Int = 100000): DataFrame =
    candidatePairs(left, leftId, leftStr, right, rightId, rightStr,
      maxDist, maxVariantBucket)
      // thresholded levenshtein: early-exits past maxDist and returns -1
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("__lid").as("left_id"), col("__rid").as("right_id"), col("dist"))

  /** X143 — the Jaro-Winkler-VERIFIED fuzzy join: same FastSS deletion-
    * neighborhood blocking, but candidates are kept by
    * `jaro_winkler_micro(left, right) >= minJwMicro` — the comparator
    * production record linkage ranks on (Splink's default family; see
    * [[graft.functions.JaroWinkler]] for why Levenshtein mis-ranks
    * transpositions and short names).
    *
    * Stated contract: pairs with lev ≤ maxDist AND jw ≥ minJwMicro —
    * BOTH verifications apply. The lev bound keeps the output set
    * blocking-independent (a shared deletion variant can propose pairs
    * out to lev ≤ 2·maxDist, and which of those appear would otherwise
    * depend on the index shape, not the data); a pair with high JW but
    * edit distance > maxDist (rare for the short identity fields this
    * targets) is not emitted — the classical block-then-compare trade
    * every production linker makes, stated rather than hidden.
    *
    * Scale shape identical to [[fuzzyJoin]]: keyed variant join, capped
    * buckets, verification map-only over candidates via the codegen'd
    * expression. Output: (left_id, right_id, dist, jw_micro) — the exact
    * Levenshtein distance and the micro JW similarity, both scores so
    * downstream agreement levels can band on either. */
  def fuzzyJoinJw(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, minJwMicro: Long,
      maxVariantBucket: Int = 100000): DataFrame = {
    require(minJwMicro >= 0L && minJwMicro <= 1000000L,
      s"minJwMicro must be in [0, 1e6], got $minJwMicro")
    // lazy per-session registration (the Quantize.dot pattern) so the
    // Column builder below resolves without a session-wide setup step
    graft.functions.GraftFunctions.register(left.sparkSession)
    candidatePairs(left, leftId, leftStr, right, rightId, rightStr,
      maxDist, maxVariantBucket)
      // lev first (early-exit form, cheaper than JW's full matrix-free
      // pass on the common far-apart candidate), JW only on survivors
      .withColumn("dist", levenshtein(col("__ls"), col("__rs"), maxDist))
      .filter(col("dist") >= 0)
      .withColumn("jw_micro",
        graft.functions.GraftFunctions.jaroWinklerMicro(col("__ls"), col("__rs")))
      .filter(col("jw_micro") >= minJwMicro)
      .select(col("__lid").as("left_id"), col("__rid").as("right_id"),
        col("dist"), col("jw_micro"))
  }
}
