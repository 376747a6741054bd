package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns (X3 scale path): 4× less
  * memory/shuffle/disk than float32 for ANN workloads, at a reconstruction
  * error bounded by scale/2 per component — the standard first compression
  * step before IVF/LSH indexing (product quantization is the heavier
  * follow-on; symmetric scalar int8 is what vector stores default to).
  *
  * Symmetric per-vector scaling: `scale = max|x| / 127`, `q = round(x /
  * scale)` as `tinyint`. Per-VECTOR (not per-corpus) scales are map-only —
  * no corpus-wide max reduction, no shuffle, and outlier vectors cannot
  * crush everyone else's resolution.
  *
  * Codegen notes: the scale lands in its OWN column first and the quantize
  * lambda references that attribute — referencing the max-abs aggregate
  * subtree inside the transform lambda would re-evaluate it per element
  * (O(d²) per vector, the documented HOF outer-reference trap). */
object Quantize {

  /** Add `scaleCol` (double) and `qCol` (array<tinyint>) alongside `vec`.
    * Null vectors yield null scale/qvec; a zero vector quantizes to zeros
    * with scale 0 (dequantize returns exact zeros). */
  def quantizeInt8(df: DataFrame, vec: String, qCol: String = "qvec",
      scaleCol: String = "scale"): DataFrame = {
    require(!df.columns.contains(qCol) && !df.columns.contains(scaleCol),
      s"output column $qCol/$scaleCol already exists; pass different names")
    df.withColumn(scaleCol,
        aggregate(col(vec), lit(0.0), (a, x) => greatest(a, abs(x.cast("double"))))
          / 127.0)
      .withColumn(qCol,
        when(col(scaleCol) === 0.0,
          transform(col(vec), _ => lit(0).cast("tinyint")))
        // a NaN element makes the max (greatest treats NaN as largest) and an
        // ±Inf element makes scale infinite: null qvec, like a null vector —
        // the alternative is an ANSI cast error killing the task (NaN) or a
        // silent all-zeros quantization (Inf). One bad vector must not take
        // down a 100 TB pass.
        .when(isnan(col(scaleCol)) || col(scaleCol) === Double.PositiveInfinity,
          lit(null).cast("array<tinyint>"))
        .otherwise(
          transform(col(vec), x =>
            round(x.cast("double") / col(scaleCol)).cast("tinyint"))))
  }

  /** Reconstruct `array<double>` from (qvec, scale). Error per component is
    * at most scale/2 (round-to-nearest), the bound QuantizeSpec pins. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Binary (sign-bit) quantization: a `dim`-float vector → ⌈dim/64⌉ packed
    * 64-bit words (bit = 1 iff component ≥ 0) — 32× less shuffle/disk than
    * float32, the compression behind binary-embedding retrieval at corpus
    * scale. Hamming distance between sign codes approximates angular
    * distance (each sign bit is a fixed-hyperplane LSH bit, so collision
    * probability is 1 − θ/π per Goemans-Williamson); the standard pipeline
    * generates candidates with [[hamming]] over the codes and re-ranks the
    * survivors with exact [[graft.functions.CosineSimilarity]] on floats.
    * Map-only, fuses into the scan. Bits pack MSB-first per word; a final
    * partial word keeps its bits in the LOW positions — consistent across
    * vectors of the same `dim`, which is all Hamming needs. NaN packs as 1:
    * Spark SQL orders NaN larger than every number (so NaN ≥ 0 is TRUE) and
    * DuckDB does the same — the two engines agree, and one bad component
    * costs one bit, never the whole code. A NULL component packs as 0 (same
    * one-bit blast radius); a vector whose length ≠ `dim` nulls the WHOLE
    * code — its bits would sit misaligned against full-length codes, making
    * every distance silently wrong — and [[hammingTopK]] sorts null codes
    * last so they can never displace a real neighbor. */
  def binarySign(vec: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    val nWords = (dim + 63) / 64
    val words = (0 until nWords).map { w =>
      val len = math.min(64, dim - w * 64)
      aggregate(slice(vec, lit(w * 64 + 1), lit(len)), lit(0L),
        // a NULL component packs as 0 (null >= 0 is null → otherwise
        // branch) — one missing value costs one bit, documented below
        (acc, x) => shiftleft(acc, 1)
          .bitwiseOR(when(x >= 0, lit(1L)).otherwise(lit(0L))))
    }
    // a vector of the WRONG length would pack fewer shifts and leave every
    // bit misaligned against full-length codes — structurally wrong Hamming
    // distances with no error anywhere. Null the code instead (the
    // quantizeInt8 bad-vector convention); hammingTopK sorts nulls last.
    when(size(vec) === dim, array(words: _*))
  }

  /** Hamming distance between two packed sign-code arrays: popcount of the
    * per-word XOR, summed — pure codegen'd integer ops, the cheapest
    * distance there is. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)

  /** Brute-force Hamming top-k of every corpus code against one query code
    * (a 1-row frame): broadcast the query, map-only distance, bounded-heap
    * top-k (`TakeOrderedAndProject`) — no shuffle of the corpus, no global
    * sort. Ties break on `id` so the result is deterministic. At larger k·N
    * this is the candidate stage; re-rank survivors with exact cosine. */
  def hammingTopK(codes: DataFrame, id: String, codeCol: String,
      query: DataFrame, queryCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    codes.crossJoin(broadcast(query))
      .select(col(id), hamming(col(codeCol), col(queryCol)).as("hamming"))
      // nulls LAST: Spark's ASC default is nulls-first, which would rank a
      // null code (null/corrupt vector) as the NEAREST neighbor and push a
      // true neighbor out of the top-k — and diverge from SQL engines that
      // default nulls-last
      .orderBy(col("hamming").asc_nulls_last, col(id))
      .limit(k)
  }

  // -------------------------------------------------------------------
  // Product quantization (X34 — Jégou, Douze, Schmid 2011, "Product
  // quantization for nearest neighbor search", TPAMI 33(1)): split the
  // vector into m subspaces, snap each subvector to its nearest centroid
  // from a per-subspace codebook of K entries — m·⌈log₂K⌉ bits per vector
  // (m=8, K=256 ⇒ 8 bytes for a 64-dim float vector, 32×) with distances
  // still computable FROM THE CODES via asymmetric distance computation
  // (ADC): ‖q − decode(code)‖² = Σ_s ‖q_s − centroid(code_s)‖², a
  // per-subspace table lookup. The accuracy middle ground between int8
  // ([[quantizeInt8]], 4×) and sign bits ([[binarySign]], 32× but 1 bit of
  // direction only) — PQ preserves graded distances at the same 32×.
  //
  // Codebooks are LITERALS (the ivfTopK convention): training them is
  // k-means per subspace — run [[graft.sim.Similarity]]'s kMeansRefine per
  // subspace offline and paste; at query time both encode and ADC are then
  // map-only expressions, no join against a codebook table, no shuffle
  // anywhere but the bounded top-k. Encoding arithmetic is chosen for
  // engine replayability: argmin_c [cc_c − 2·q_s·c] (the ‖q_s‖² term is
  // constant within a subspace and dropped), all left-to-right IEEE sums —
  // a DuckDB oracle reproduces every code and distance bit-for-bit.

  /** Validated (offsets, total dim) of a codebook set; shared by encode
    * and ADC, which MUST agree on the layout. */
  private def pqLayout(codebooks: Seq[Seq[Seq[Double]]]): (Seq[Int], Int) = {
    require(codebooks.nonEmpty, "pq needs at least one subspace")
    codebooks.zipWithIndex.foreach { case (cents, s) =>
      require(cents.nonEmpty, s"subspace $s has an empty codebook")
      require(cents.size <= 256, s"subspace $s has ${cents.size} centroids (>256)")
      require(cents.forall(_.length == cents.head.length),
        s"subspace $s centroids differ in length")
      require(cents.head.nonEmpty, s"subspace $s centroids are zero-length")
    }
    val widths = codebooks.map(_.head.length)
    (widths.scanLeft(0)(_ + _).init, widths.sum)
  }

  /** Left-to-right double dot product — the native codegen'd
    * [[graft.functions.DotProduct]] (bit-identical to the former
    * `aggregate(zip_with(...))` fold, which ran interpreted and allocated
    * a zipped array per row — the innermost loop of encode/ADC/assign
    * deserves a bare multiply-add loop). Registration is lazy against the
    * active session so these Column builders stay session-free. */
  private[sim] def dot(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    graft.functions.GraftFunctions.dotProduct(a, b)
  }

  /** Nearest-centroid index for one subvector: argmin over
    * cc_c − 2·(sub·c) (the ‖sub‖² term is constant within a subspace and
    * dropped), ties to the LOWEST index via struct-min. Shared by encode,
    * stats and training — they MUST agree on the assignment rule. */
  private def pqNearest(sub: Column, cents: Seq[Seq[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (cent, j) =>
      val cc = cent.foldLeft(0.0)((a, x) => a + x * x)
      struct((lit(cc) - lit(2.0) * dot(sub, lit(cent.toArray))).as("s"),
        lit(j).as("c"))
    }
    array_min(array(scored: _*)).getField("c")
  }

  /** Add `outCol`: the PQ code (array<int>, one 0-based centroid index per
    * subspace). Nearest centroid by squared L2, ties to the LOWEST index
    * (deterministic); a vector whose length ≠ the codebook dim gets a NULL
    * code (the [[binarySign]] bad-vector convention — misencoded codes
    * would make every ADC distance silently wrong); [[pqAdcTopK]] sorts
    * null codes last. Map-only, fuses into the scan. */
  def pqEncode(df: DataFrame, vec: Column, codebooks: Seq[Seq[Seq[Double]]],
      outCol: String = "pq_code"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists; pass a different name")
    val (offs, dim) = pqLayout(codebooks)
    val v = vec.cast("array<double>")
    val codes = codebooks.zipWithIndex.map { case (cents, s) =>
      pqNearest(slice(v, offs(s) + 1, cents.head.length), cents)
    }
    df.withColumn(outCol, when(size(v) === dim, array(codes: _*)))
  }

  /** ADC top-k: approximate squared L2 distance of every coded corpus row
    * to ONE query vector (a 1-row frame carrying `queryVecCol`, broadcast),
    * `dist` rounded to 6. Per subspace the query's centroid dot products
    * form a K-entry in-plan lookup the code indexes into — the corpus side
    * touches only its (tiny) code column: the scan never reads full
    * vectors, nothing shuffles, the top-k is a bounded heap
    * (`TakeOrderedAndProject`). Re-rank survivors with exact cosine on the
    * float column when PQ error matters (the [[hammingTopK]] two-stage
    * pattern). Must be called with the codebooks the codes were built
    * with. */
  def pqAdcTopK(codes: DataFrame, id: String, codeCol: String,
      query: DataFrame, queryVecCol: String, codebooks: Seq[Seq[Seq[Double]]],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (offs, _) = pqLayout(codebooks)
    val qv = col(queryVecCol).cast("array<double>")
    val terms = codebooks.zipWithIndex.map { case (cents, s) =>
      val qsub = slice(qv, offs(s) + 1, cents.head.length)
      val qq = dot(qsub, qsub)
      val dots = array(cents.map(cent => dot(qsub, lit(cent.toArray))): _*)
      val ccArr = lit(cents.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray)
      val c = element_at(col(codeCol), s + 1)
      qq - lit(2.0) * element_at(dots, c + 1) + element_at(ccArr, c + 1)
    }
    codes.crossJoin(broadcast(query.select(col(queryVecCol))))
      .select(col(id), round(terms.reduceLeft(_ + _), 6).as("dist"))
      .orderBy(col("dist").asc_nulls_last, col(id))
      .limit(k)
  }

  /** [[pqAdcTopK]] for a DRIVER-HELD query vector — the deployment fast
    * path ([[graft.sim.IvfPqIndex.search]] always has the query as a
    * literal). The column-query form above must recompute every
    * query·centroid dot product PER CORPUS ROW (the query arrives as a
    * column, so nothing in the plan is constant-foldable and the HOF
    * arithmetic runs interpreted): O(m·K·subDim) float ops per row. Here
    * the per-subspace ADC tables `T_s[c] = ‖q_s‖² − 2·q_s·c + ‖c‖²`
    * are computed ONCE on the driver — O(m·K·subDim) total — with the
    * exact left-to-right IEEE fold the in-plan form uses, so distances
    * are bit-identical to [[pqAdcTopK]] (QuantizeSpec pins that); the
    * per-row work collapses to m literal-array lookups + a sum, all
    * codegen'd, no HOF anywhere. Same contract otherwise: `dist`
    * rounded to 6, null codes sort last, bounded top-k. */
  def pqAdcTopKLiteral(codes: DataFrame, id: String, codeCol: String,
      queryVec: Seq[Double], codebooks: Seq[Seq[Seq[Double]]],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (offs, dim) = pqLayout(codebooks)
    require(queryVec.length == dim,
      s"query has dim ${queryVec.length}, codebooks span $dim")
    val tables = codebooks.zipWithIndex.map { case (cents, s) =>
      val qsub = queryVec.slice(offs(s), offs(s) + cents.head.length)
      val qq = qsub.foldLeft(0.0)((a, x) => a + x * x)
      cents.map { cent =>
        // identical op order to the in-plan form: qq − 2·(q·c) + ‖c‖²
        val dot = qsub.zip(cent).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val cc = cent.foldLeft(0.0)((a, x) => a + x * x)
        qq - 2.0 * dot + cc
      }.toArray
    }
    val terms = tables.zipWithIndex.map { case (t, s) =>
      element_at(lit(t), element_at(col(codeCol), s + 1) + 1)
    }
    codes.select(col(id), round(terms.reduceLeft(_ + _), 6).as("dist"))
      .orderBy(col("dist").asc_nulls_last, col(id))
      .limit(k)
  }

  /** Per-ROW ADC lookup tables for a COLUMN query vector — the batched
    * middle ground between [[pqAdcTopK]] (recomputes every query·centroid
    * dot product PER CORPUS ROW) and [[pqAdcTopKLiteral]] (driver-side
    * tables, single query only): evaluated on the PROBE frame, each probe
    * row pays the O(m·K·subDim) table build exactly once, and every
    * candidate row it later meets does m array lookups
    * ([[pqAdcDistFromTables]]). One flattened array<double> of Σ_s K_s
    * entries, subspace-major — T[off_s + c] = ‖q_s‖² − 2·q_s·c + ‖c‖²,
    * with the same left-to-right IEEE fold and term order as both
    * existing forms, so distances stay bit-identical (QuantizeSpec pins
    * it). */
  def pqAdcTables(queryVec: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (offs, _) = pqLayout(codebooks)
    val qv = queryVec.cast("array<double>")
    flatten(array(codebooks.zipWithIndex.map { case (cents, s) =>
      val qsub = slice(qv, offs(s) + 1, cents.head.length)
      val qq = dot(qsub, qsub)
      val ccs = cents.map(_.foldLeft(0.0)((a, x) => a + x * x))
      array(cents.zip(ccs).map { case (cent, cc) =>
        qq - lit(2.0) * dot(qsub, lit(cent.toArray)) + lit(cc)
      }: _*)
    }: _*))
  }

  /** ADC distance from a [[pqAdcTables]] column and a code column: m
    * lookups + a left-to-right sum, rounded to 6 like every ADC face —
    * the codegen-friendly per-candidate kernel of batched retrieval. */
  def pqAdcDistFromTables(tables: Column, code: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val ks = codebooks.map(_.size)
    val tableOffs = ks.scanLeft(0)(_ + _).init
    val terms = codebooks.indices.map { s =>
      element_at(tables, lit(tableOffs(s) + 1) + element_at(code, s + 1))
    }
    round(terms.reduceLeft(_ + _), 6)
  }

  /** Per-(subspace, cell, component) assignment statistics under a given
    * codebook: `(s, cell, pos, comp_sum_micro, n)` — `n` is cell occupancy
    * (the codebook-balance monitor: a cell holding half the corpus means
    * the codebook no longer fits the data and ADC error is concentrated
    * there), `comp_sum_micro` the component sum in integer MICRO-units:
    * each component is scaled by 1e6 and rounded to a whole number BEFORE
    * summing, so the aggregate is pure BIGINT arithmetic. This is the
    * repo's float-determinism rule taken to its endpoint: fractional-scale
    * `round(x, 6)` diverges across engines (Spark rounds the shortest
    * decimal repr via HALF_UP, DuckDB rounds `x*1e6` in binary — a value
    * whose decimal repr reads `…5` but whose binary product falls below
    * the half-way point flips between them), whereas rounding the SAME
    * IEEE double `x*1e6` at an integer boundary agrees everywhere: at an
    * exact `.5` both round away from zero, and off the tie both see the
    * same side. No DECIMAL appears anywhere, so no engine- or
    * driver-dependent decimal rendering exists either. `comp_sum_micro /
    * (1e6 · n)` is the cell's Euclidean mean to 1e-6 — the Lloyd update
    * [[pqTrain]] consumes. One scan; the explode collapses under map-side
    * partial aggregation to ≤ m·K·subDim rows, corpus-size-independent
    * (the q97 kMeansRefine shuffle contract). Wrong-length vectors are
    * excluded (they have no valid assignment). */
  def pqCellStats(df: DataFrame, vec: Column,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val (offs, dim) = pqLayout(codebooks)
    val v = vec.cast("array<double>")
    val layers = explode(array(codebooks.zipWithIndex.map { case (cents, s) =>
      val sub = slice(v, offs(s) + 1, cents.head.length)
      struct(lit(s).as("s"), pqNearest(sub, cents).as("cell"), sub.as("sub"))
    }: _*)).as("layer")
    df.filter(size(v) === dim)
      .select(layers)
      .select(col("layer.s").as("s"), col("layer.cell").as("cell"),
        posexplode(col("layer.sub")))
      .groupBy(col("s"), col("cell"), col("pos"))
      .agg(sum(round(col("col") * lit(1000000.0)).cast("long"))
        .as("comp_sum_micro"), count(lit(1)).as("n"))
  }

  /** Train PQ codebooks: Lloyd's k-means per subspace (Euclidean — NOT the
    * spherical variant `Similarity.kMeansRefine` uses for IVF: PQ
    * approximates L2 distances, so centroids are plain means, never
    * renormalized). All m subspaces train in the SAME per-iteration pass:
    * one [[pqCellStats]] scan whose collected output is m·K·subDim rows —
    * corpus-size-independent driver state, integer micro-unit sums so the
    * trained codebooks are bit-deterministic at any partitioning. Empty
    * cells keep their previous centroid. Seeding is deterministic: the K
    * vectors with the lowest (xxhash64, value) rank — hash-spread, stable
    * under re-partitioning and retries. Fewer than K full-length vectors
    * seed that many centroids instead (a codebook can't outnumber its
    * data). `iterations = 0` returns the seeds — the honest baseline for
    * measuring what training bought. */
  def pqTrain(df: DataFrame, vec: Column, dim: Int, m: Int, k: Int,
      iterations: Int): Seq[Seq[Seq[Double]]] = {
    require(dim > 0 && m > 0 && dim % m == 0,
      s"m must divide dim, got dim=$dim m=$m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    require(iterations >= 0 && iterations <= 50,
      s"iterations must be in [0, 50], got $iterations")
    val w = dim / m
    val v = vec.cast("array<double>")
    val seeds = df.filter(size(v) === dim).select(v.as("__v"))
      .orderBy(xxhash64(col("__v")), col("__v").cast("string"))
      .limit(k)
      .collect().map(_.getSeq[Double](0).toIndexedSeq)
    require(seeds.nonEmpty, s"pqTrain found no length-$dim vectors")
    var cbs: Seq[Seq[Seq[Double]]] =
      (0 until m).map(s => seeds.toSeq.map(_.slice(s * w, s * w + w).toSeq))
    for (_ <- 0 until iterations) {
      val stats = pqCellStats(df, vec, cbs).collect()
      val bySub = stats.groupBy(_.getInt(0))
      cbs = cbs.zipWithIndex.map { case (cents, s) =>
        val byCell = bySub.getOrElse(s, Array.empty).groupBy(_.getInt(1))
        cents.zipWithIndex.map { case (old, j) =>
          byCell.get(j) match {
            case Some(rows) =>
              rows.sortBy(_.getInt(2))
                .map(r => r.getLong(3).toDouble / 1e6 / r.getLong(4)).toSeq
            case None => old
          }
        }
      }
    }
    cbs
  }
}
