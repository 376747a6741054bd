package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over embedding columns (SURVEY.md §2.9 X3):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the approximate scale path, and cosine-threshold near-
  * duplicate pairing.
  *
  * Scale design (100 TB of embeddings):
  *  - the query set is broadcast — the corpus is never shuffled for scoring;
  *    scoring is a map-only stage fused into the scan;
  *  - top-k never globally sorts: per-partition top-k (groupBy on
  *    (query, partition) with a bounded sorted-slice) then a final merge over
  *    `numPartitions × k` rows per query;
  *  - the dot product is graft's codegen'd [[graft.functions.CosineSimilarity]]
  *    native expression — a primitive loop, no per-element boxing;
  *  - LSH signatures are deterministic (hyperplanes seeded by xxhash64), so
  *    results are reproducible across runs and cluster layouts.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 mapped to [-1, 1). Stateless — both sides of any comparison
    * regenerate the same planes from the seed. */
  private def planeComponent(p: Column, d: Column, seed: Int): Column =
    (xxhash64(p, d, lit(seed)).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bucket LSH signature: `nPlanes` bits, bit p = sign of the dot
    * product with pseudo-random hyperplane p. Cosine-similar vectors collide
    * with probability (1 - θ/π)^nPlanes. Pure per-row expression. */
  def lshSignature(vec: Column, nPlanes: Int = 16, seed: Int = 42): Column = {
    // a signature is ONE long: more than 64 planes would alias (both `1L <<
    // p` and shiftright mask the shift count mod 64 — silently corrupt bands)
    require(nPlanes >= 1 && nPlanes <= 64, s"nPlanes must be in [1, 64], got $nPlanes")
    val sig = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(lit(p), d, seed)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    // null/empty vectors have no sign structure: null signature, matching the
    // corpus-side aggregate form (which omits such rows) instead of a
    // spurious sig=0 that collides with every all-negative-dots bucket.
    // Guard on isNull explicitly: under legacy (non-ANSI) semantics
    // size(null) is -1, so a size-only check would miss null vectors.
    when(vec.isNull || size(vec) === 0, lit(null).cast("long")).otherwise(sig)
  }

  /** LSH signatures for a whole corpus: posexplode vector components, one
    * hash-aggregate with nPlanes codegen'd `sum(x·plane_p[d])` columns, then
    * assemble sign bits. Same bits as [[lshSignature]] up to floating-point
    * summation order — deterministic for a fixed plan. Partial aggregation
    * keeps shuffle state at nPlanes doubles per vector, and nothing is
    * recomputed per band downstream (signatures are aggregation outputs).
    *
    * The plane matrix is PRECOMPUTED once as a dim-keyed broadcast table
    * (dim × nPlanes hash evaluations total), not re-derived per vector
    * element: `xxhash64(plane, dim, seed)` depends only on (plane, dim), and
    * evaluating it per (row, dim, plane) — the naive formulation — costs
    * rows × dim × nPlanes hash calls (~50M at a 2k-doc corpus, billions at
    * scale) for values that never change. Pass `dim` when the embedding
    * dimensionality is known (the usual contract — it skips a scan);
    * otherwise it is inferred as the corpus-wide MAX vector size, never
    * from one arbitrary sampled row, so ragged or empty leading rows
    * cannot silently truncate every signature. Null/empty vectors produce
    * no exploded elements and are absent from the output. Output:
    * (id, sig long). */
  def lshSignatures(corpus: DataFrame, id: String, vec: String,
      nPlanes: Int, seed: Int = 42, dim: Int = -1): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 64, s"nPlanes must be in [1, 64], got $nPlanes")
    val spark = corpus.sparkSession
    val dimActual =
      if (dim > 0) dim
      else corpus.agg(max(size(col(vec))).as("d")).collect() match {
        case Array(r) if !r.isNullAt(0) => r.getInt(0)
        case _ => 0 // empty corpus: signatures of nothing
      }
    // one row per dimension, each carrying that dimension's nPlanes plane
    // components — computed with the SAME xxhash64 expression as the per-row
    // [[lshSignature]] (int plane, int dim, int seed), so signatures stay
    // interchangeable between the two forms
    val planesTbl = spark.range(dimActual.toLong.max(0L)).select(
      col("id").cast("int").as("dim"),
      array((0 until nPlanes).map(p =>
        planeComponent(lit(p), col("id").cast("int"), seed)): _*).as("pc"))
    val dots = (0 until nPlanes).map(p =>
      sum(col("x").cast("double") * element_at(col("pc"), p + 1)).as(s"d$p"))
    corpus
      .select(col(id), posexplode(col(vec)))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
      .join(broadcast(planesTbl), "dim")
      .groupBy(col(id))
      .agg(dots.head, dots.tail: _*)
      .select(col(id),
        (0 until nPlanes).map(p =>
            when(col(s"d$p") >= 0, lit(1L << p)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** Exact brute-force cosine top-k: for every row of `queries`, the k most
    * similar `corpus` rows. Queries must be small enough to broadcast (the
    * usual case: a probe set against a huge corpus).
    *
    * Output: (query_id, neighbor_id, sim, rank), rank 1..k, ties broken by
    * neighbor id. `sim` is rounded to `roundTo` decimals for cross-engine
    * comparability (double accumulation order is fixed: sequential).
    *
    * `excludeSelf` drops corpus rows whose id equals the query id — set it
    * only when queries are drawn FROM the corpus (self-match suppression);
    * with an unrelated probe table it would silently drop corpus vectors
    * that merely share id values. */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      roundTo: Int = 6,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryId).as("__query_id"), col(queryVec).as("__qvec"))
    val gate =
      if (excludeSelf) col("__query_id") =!= col(corpusId) else lit(true)
    topKPerKey(scoreAgainstProbes(corpus, corpusId, corpusVec, q, gate,
      roundTo), "query_id", k)
  }

  /** The ONE broadcast-probe scoring stage [[bruteForceTopK]] and
    * [[hardNegatives]] share: probes (pre-renamed to `__query_id`/`__qvec`
    * — queries drawn FROM the corpus share column names and the raw
    * crossJoin would die with AMBIGUOUS_REFERENCE) broadcast against the
    * corpus, `gate` filters pairs BEFORE the dot product is paid, cosine
    * rounds to `roundTo`. The corpus is never shuffled; a shared fix to
    * this shape (NaN handling, rename workaround, rounding) lands once. */
  private def scoreAgainstProbes(corpus: DataFrame, corpusId: String,
      corpusVec: String, probes: DataFrame, gate: Column,
      roundTo: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.crossJoin(broadcast(probes))
      .filter(gate)
      .select(
        col("__query_id").as("query_id"),
        col(corpusId).as("neighbor_id"),
        round(GraftFunctions.cosineSim(col("__qvec"), col(corpusVec)), roundTo).as("sim"))
  }

  /** X58 — hard-negative mining: contrastive training's OTHER negative
    * supply — [[graft.ops.Sampling.negativeSamples]] draws RANDOM
    * negatives; the hard ones are the semantically-CLOSE wrong answers
    * that actually shape the decision margin (retriever/embedding
    * training curricula interleave both). For each probe vector: the
    * top-k most similar corpus vectors carrying a DIFFERENT label, with
    * the neighbor's label in the output (mined pairs ship as training
    * triples).
    *
    * Plan shape: [[bruteForceTopK]]'s — probe set broadcasts, the corpus
    * is never shuffled, scoring dies into per-partition bounded heaps —
    * with a cross-label gate ahead of the cosine so same-label pairs
    * never pay the dot product; the label lookup then broadcasts the
    * queries×k result back against the corpus projection (the
    * [[knnClassify]] second stage). Swap the candidate stage for
    * [[ivfTopK]] when the probe set outgrows broadcast. NULL labels mine
    * nothing and match nothing — an unlabeled row's "differentness" is
    * unknown, and a hard negative must be a KNOWN wrong answer. */
  def hardNegatives(
      corpus: DataFrame,
      id: String,
      vec: String,
      label: String,
      queries: DataFrame,
      k: Int = 10,
      roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(id).as("__query_id"), col(vec).as("__qvec"),
      col(label).as("__qlabel"))
    val crossLabel = col(label).isNotNull && col("__qlabel").isNotNull &&
      col(label) =!= col("__qlabel")
    val scored = scoreAgainstProbes(corpus, id, vec, q, crossLabel, roundTo)
    corpus.select(col(id).as("neighbor_id"), col(label).as("neg_label"))
      .join(broadcast(topKPerKey(scored, "query_id", k)), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        col("sim"), col("rank"))
  }

  /** X62 — margin-based pair mining across two embedding spaces (Artetxe
    * & Schwenk, ACL 2019 — the scoring rule behind LASER/CCMatrix bitext
    * mining, and equally the cross-corpus alignment step of any paired-
    * data pipeline: caption↔image, question↔passage, translation pairs).
    *
    * Raw cosine is miscalibrated across neighborhoods — a "hub" vector is
    * close to EVERYTHING, so absolute thresholds either flood with hub
    * pairs or starve sparse regions. The ratio margin normalizes each
    * candidate pair (x, y) by the mean similarity of both endpoints' own
    * top-k neighborhoods:
    *
    *   margin(x,y) = cos(x,y) / (avgNNk(x→tgt)/2 + avgNNk(y→src)/2)
    *
    * Hub-driven pairs score ≈ 1 (the pair is no better than the endpoints'
    * background); genuinely aligned pairs score well above it.
    *
    * Candidates are src's top-k in tgt (the paper's forward direction);
    * both penalty terms fall out of the SAME two top-k passes, so margin
    * costs nothing beyond the second direction's search. Determinism:
    * sims are rounded to `roundTo` first, neighborhood means are exact
    * DECIMAL sums of those rounded sims over the true neighbor count —
    * addition-order-free, so an oracle summing in a different order
    * cannot drift a margin across its rounding boundary.
    *
    * Plan shape: two [[bruteForceTopK]] passes — each broadcasts one
    * side's probes and never shuffles the other side — then two penalty
    * frames of O(|src|) and O(|tgt|) rows broadcast back onto the
    * queries×k candidate list: the corpus-sized frames never cross an
    * Exchange. When neither side fits a broadcast, swap the candidate
    * stages for [[ivfTopK]] — margin only ever needs each side's top-k.
    *
    * Output: (src_id, tgt_id, sim, margin), one row per forward
    * candidate; thresholding / mutual-best filtering is the caller's
    * downstream filter, not baked in. Degenerate neighborhoods — a
    * penalty denominator within 1e-9 of 0, possible when a vector's
    * rounded top-k sims cancel (zero vectors, mutually-orthogonal or
    * mixed-sign cosines summing to 0) — yield a NULL margin rather than
    * NaN/±Inf: the ratio test is meaningless against a zero background,
    * and a NULL is filterable downstream where an Inf would silently
    * win every threshold. */
  def marginScores(
      src: DataFrame, srcId: String, srcVec: String,
      tgt: DataFrame, tgtId: String, tgtVec: String,
      k: Int = 4, roundTo: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val fwd = bruteForceTopK(tgt, tgtId, tgtVec, src, srcId, srcVec,
      k, roundTo, excludeSelf = false)
    val bwd = bruteForceTopK(src, srcId, srcVec, tgt, tgtId, tgtVec,
      k, roundTo, excludeSelf = false)
    // mean of a neighborhood's ROUNDED sims as an exact decimal sum over
    // the true neighbor count (< k only when the other side is smaller
    // than k) — bit-stable under any summation order
    def penalty(nn: DataFrame, outId: String, outAvg: String) =
      nn.groupBy(col("query_id").as(outId))
        .agg((sum(col("sim").cast("decimal(20,6)")).cast("double")
          / count(lit(1))).as(outAvg))
    val pSrc = penalty(fwd, "__src_pen_id", "__src_avg")
    val pTgt = penalty(bwd, "__tgt_pen_id", "__tgt_avg")
    fwd
      .join(broadcast(pSrc), col("query_id") === col("__src_pen_id"))
      .join(broadcast(pTgt), col("neighbor_id") === col("__tgt_pen_id"))
      .select(
        col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"),
        col("sim"), {
          // NULL, not NaN/Inf, when the neighborhood background is 0
          val denom = (col("__src_avg") + col("__tgt_avg")) / 2
          when(abs(denom) > lit(1e-9),
            round(col("sim") / denom, roundTo)).as("margin")
        })
  }

  /** k-nearest-neighbor majority-vote classification: each query row gets
    * the label most frequent among its k nearest corpus rows by cosine
    * (embedding-space label propagation — weak-label transfer, eval-set
    * leakage detection, cluster naming). Ties break deterministically:
    * higher vote count first, then the SMALLEST label (so two engines and
    * two runs always agree).
    *
    * Plan shape at scale: the neighbor search is [[bruteForceTopK]] (probe
    * set broadcast against the corpus, per-key bounded heaps — the corpus is
    * never shuffled); the label lookup broadcasts the queries×k neighbor
    * list back against the corpus projection (corpus side stays
    * exchange-free); the vote count aggregates queries×k rows. Swap the
    * first stage for [[ivfTopK]] when the probe set is itself large.
    *
    * `labelCol` must be integral (the smallest-label tie-break needs a
    * total order that matches the oracle's). `excludeSelf` follows
    * [[bruteForceTopK]]'s contract: leave it true ONLY when queries are
    * drawn from the corpus (suppresses the trivial self-vote); with an
    * UNRELATED probe table set it false, or corpus neighbors that merely
    * share an id value with a probe are silently dropped from the vote.
    * Output: (query_id, label, votes). */
  def knnClassify(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      labelCol: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      roundTo: Int = 6,
      excludeSelf: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val nn = bruteForceTopK(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k, roundTo, excludeSelf)
    // queries×k rows — broadcast them so the corpus-side label projection
    // joins without an Exchange
    val labeled = corpus
      .select(col(corpusId).as("neighbor_id"), col(labelCol).cast("long").as("__lbl"))
      .join(broadcast(nn.select("query_id", "neighbor_id")), "neighbor_id")
    labeled
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
      // argmax by (votes desc, label asc): max of (votes, -label) structs
      .groupBy("query_id")
      .agg(max(struct(col("votes"), (-col("__lbl")).as("nl"))).as("w"))
      .select(col("query_id"), (-col("w.nl")).as("label"), col("w.votes").as("votes"))
  }

  /** Distributed per-key top-k (by sim desc, neighbor_id asc) without a
    * global sort and without shuffling the scored set: stage 1 keeps a
    * bounded k-heap per key inside each input partition (`mapPartitions` —
    * a declarative groupBy can't truncate partial collect_list buffers, so
    * it would shuffle every scored row), emitting ≤ keys×k rows per
    * partition; stage 2 merges the survivors per key with a sorted-slice
    * aggregation. Shuffle volume is partitions×keys×k, never corpus-sized —
    * the property that makes this safe at scale where
    * `Window.partitionBy(key).orderBy(...)` (all rows of a key in one task)
    * is not. Input needs columns (key: long, neighbor_id: long, sim: double).
    * NaN sims (e.g. cosine of a zero-norm vector) are dropped up front — the
    * two stages would otherwise rank NaN inconsistently (heap keeps it as
    * 'best', merge sorts it last), letting a garbage row evict a real one. */
  def topKPerKey(scored: DataFrame, key: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // "worse" = lower sim, tie → larger id; the PQ max must be the worst so
    // overflow evicts it: reversed on sim (lower ⇒ greater), natural on id
    val worstFirst: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    val partial = scored
      .filter(!isnan(col("sim")))
      .select(col(key).cast("long"), col("neighbor_id").cast("long"), col("sim").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (q, n, s) =>
          val h = heaps.getOrElseUpdate(q,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          h.enqueue((s, n))
          if (h.size > k) h.dequeue()
        }
        heaps.iterator.flatMap { case (q, h) => h.iterator.map { case (s, n) => (q, n, s) } }
      }
      .toDF(key, "neighbor_id", "sim")
    // merge: ≤ partitions×k rows per key; struct sorts lexicographically,
    // (-sim, neighbor_id) asc == sim desc, id asc
    partial
      .groupBy(col(key))
      .agg(slice(array_sort(collect_list(struct((-col("sim")).as("s"),
        col("neighbor_id").as("n")))), 1, k).as("top"))
      .select(col(key), posexplode(col("top")))
      .select(col(key), col("col.n").as("neighbor_id"),
        (-col("col.s")).as("sim"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** All corpus pairs with cosine similarity ≥ threshold (embedding near-dup
    * detection). LSH sign-buckets propose candidates (`bands` independent
    * `rowsPerBand`-bit buckets), exact cosine verifies — false positives never
    * survive; misses are pairs that collide in no band. The candidate join is
    * keyed on (band, bucket): never a cross product — but a bucket holding m
    * identical/near-identical embeddings still emits m² candidates, so
    * `maxBucketSize` caps each (band, bucket) at its smallest ids
    * (deterministic sample, drop count logged — never silent; 0 disables).
    * Run exact dedup on the embedding hash BEFORE near-dup pairing so
    * exact-duplicate classes never reach the buckets at all. */
  def cosinePairsLsh(
      corpus: DataFrame,
      id: String,
      vec: String,
      threshold: Double = 0.9,
      bands: Int = 8,
      rowsPerBand: Int = 8,
      seed: Int = 42,
      roundTo: Int = 6,
      dim: Int = -1,
      maxBucketSize: Int = 100000): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val nPlanes = bands * rowsPerBand
    val sig = lshSignatures(corpus, id, vec, nPlanes, seed, dim)
    val banded0 = sig.select(col(id),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rowsPerBand)
          .bitwiseAND((1L << rowsPerBand) - 1)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val banded =
      if (maxBucketSize > 0)
        graft.ops.Ops.capGroupSize(banded0, Seq("band", "bucket"), id,
          maxBucketSize, "cosinePairsLsh")
      else banded0
    val l = banded.select(col(id).as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col(id).as("id_b"), col("band"), col("bucket"))
    val vecs = corpus.select(col(id), col(vec))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col(id).as("id_a"), col(vec).as("vec_a")), "id_a")
      .join(vecs.select(col(id).as("id_b"), col(vec).as("vec_b")), "id_b")
      .withColumn("sim", round(GraftFunctions.cosineSim(col("vec_a"), col("vec_b")), roundTo))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** IVF (inverted-file) approximate top-k: the coarse-quantizer scale path.
    *
    *  1. pick `nCentroids` deterministic pseudo-random corpus vectors as
    *     centroids (hash-ordered sample — a k-means refinement drops in here
    *     without changing the plan shape);
    *  2. assign every corpus vector to its nearest centroid (codebook as
    *     expression literals, map-only argmax — the corpus never shuffles
    *     and the plan has no Exchange between scan and assignment);
    *  3. assign each query to its `nProbe` nearest centroids;
    *  4. score only corpus vectors in probed cells (keyed join on cell id),
    *     then bounded per-key top-k.
    *
    * Cost vs brute force: scoring work scales by ~nProbe/nCentroids.
    * Recall < 1 by design (neighbors in unprobed cells are missed);
    * nProbe = nCentroids degenerates to exact brute force — the invariant
    * SimilaritySpec checks. Deterministic: centroid choice, assignment
    * tie-breaks (highest sim, then lowest centroid id) and ranking are all
    * hash- or id-ordered. */
  def ivfTopK(
      corpus: DataFrame,
      id: String,
      vec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      roundTo: Int = 6,
      excludeSelf: Boolean = true,
      kMeansIterations: Int = 0): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // nCentroids rows to the driver — O(centroids), the IVF codebook is by
    // definition small enough to ship to every task. Optionally refined with
    // spherical k-means (better cell balance → better recall per probe).
    val cents = kMeansRefine(corpus, vec,
      sampleCodebook(corpus, id, vec, nCentroids), kMeansIterations)
    val assigned = corpus.select(col(id), col(vec),
      element_at(nearestCells(cents, col(vec), 1), 1).as("cell"))
    // nProbe nearest centroids per query — same literal argmax, exploded to
    // one row per probed cell (queries are small by contract). Internal
    // renames keep corpus-drawn query frames (shared column names) safe.
    val probes = queries.select(col(queryId).as("__query_id"), col(queryVec).as("__qvec"),
        explode(nearestCells(cents, col(queryVec), nProbe)).as("cell"))
    val joined = assigned.join(broadcast(probes), Seq("cell"))
    // excludeSelf: only valid when queries come from the corpus (see
    // bruteForceTopK) — otherwise shared id values would drop real neighbors
    val scored = (if (excludeSelf) joined.filter(col("__query_id") =!= col(id)) else joined)
      .select(col("__query_id").as("query_id"), col(id).as("neighbor_id"),
        round(GraftFunctions.cosineSim(col("__qvec"), col(vec)), roundTo).as("sim"))
    topKPerKey(scored, "query_id", k)
  }

  /** Initial IVF codebook: `k` deterministic pseudo-random corpus vectors
    * (hash-ordered sample), collected to the driver — O(k) rows. Accepts
    * `array<float>` or `array<double>` corpora; the codebook itself is
    * stored as floats (it is a coarse quantizer — cell assignment is
    * robust to float precision, and the widened cosine_sim expression
    * compares mixed element types natively). */
  private[sim] def sampleCodebook(corpus: DataFrame, id: String, vec: String,
      k: Int): Seq[(Long, Seq[Float])] = {
    // The IVF id contract: cell ids are the sampled rows' ids as longs. A
    // string id would cast to null (opaque NPE at collect time) or collapse
    // distinct values ("1"/"01") onto one cell — fail here with the contract.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    corpus.schema(id).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"ivfTopK id column '$id' must be an integral type (cell ids are longs), " +
          s"got ${other.simpleString}; add a numeric surrogate id upstream")
    }
    corpus
      .select(col(id).cast("long").as("cid"), col(vec).as("cvec"), xxhash64(col(id)).as("h"))
      .orderBy("h").limit(k).drop("h")
      .collect().toSeq.map(r => (r.getLong(0),
        r.getSeq[Any](1).map {
          case f: Float => f
          case d: Double => d.toFloat
          case other => throw new IllegalArgumentException(
            s"embedding elements must be float or double, got ${other.getClass.getSimpleName}")
        }))
  }

  /** Top-n nearest codebook cells for a vector column: a TRUE map-only
    * argmax — the codebook rides in the expression tree as literals and each
    * row sorts nCentroids (csim, −cid) structs. No explode, no shuffle, no
    * Exchange between the scan and cell assignment (a crossJoin + groupBy
    * formulation would shuffle nCentroids copies of every embedding through
    * a hash aggregate). Ties → highest csim, then lowest centroid id. */
  private[graft] def nearestCells(cents: Seq[(Long, Seq[Float])], v: Column,
      n: Int): Column = {
    val scored = array(cents.map { case (cid, cv) =>
      struct(GraftFunctions.cosineSim(v, typedlit(cv)).as("csim"),
        lit(-cid).as("nc"))
    }: _*)
    transform(
      slice(array_sort(scored, (a, b) =>
        when(a("csim") > b("csim"), -1).when(a("csim") < b("csim"), 1)
          .otherwise(signum(b("nc") - a("nc")).cast("int"))), 1, n),
      s => -s.getField("nc"))
  }

  /** Spherical k-means refinement of an IVF codebook (Lloyd's iterations
    * with cosine assignment and renormalized mean centroids — Dhillon &
    * Modha, Mach. Learn. 42, 2001). Each iteration is one map-only
    * assignment (literal codebook argmax, no corpus shuffle of vectors)
    * plus one partial-aggregated component sum whose shuffle carries
    * (cell, dim) sums — k × dim rows, corpus-size-independent — collected
    * to the driver to rebuild the codebook. Sums run in exact DECIMAL so
    * the refined centroids (and therefore every downstream assignment) are
    * bit-deterministic at any partitioning. Empty cells keep their previous
    * centroid. Returns the refined codebook under the same cell ids. */
  def kMeansRefine(corpus: DataFrame, vec: String,
      codebook: Seq[(Long, Seq[Float])], iterations: Int): Seq[(Long, Seq[Float])] = {
    GraftFunctions.register(corpus.sparkSession) // nearestCells needs cosine_sim
    var cents = codebook
    for (_ <- 0 until iterations) {
      val sums = corpus
        .select(element_at(nearestCells(cents, col(vec), 1), 1).as("cell"),
          posexplode(col(vec)))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col").cast(org.apache.spark.sql.types.DecimalType(28, 10))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val mean = rows.sortBy(_.getInt(1))
              .map(r => r.getDecimal(2).doubleValue() / r.getLong(3))
            val norm = math.sqrt(mean.map(x => x * x).sum)
            // renormalize to the unit sphere (cosine assignment is
            // magnitude-blind); a degenerate zero mean keeps the old centroid
            if (norm > 0) (cid, mean.map(x => (x / norm).toFloat).toSeq)
            else (cid, old)
          case None => (cid, old)
        }
      }
    }
    cents
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * drop documents whose EMBEDDINGS are near-duplicates, catching
    * paraphrases and translations that shingle-based near-dedup cannot see.
    *
    *  1. cluster every embedding with the IVF codebook (map-only literal
    *     argmax — no Exchange between scan and assignment, same machinery
    *     as [[ivfTopK]]);
    *  2. candidate pairs ONLY within a cluster (self-join keyed on the cell
    *     id): total pair work is Σ cellsize², bounded by codebook
    *     granularity instead of n²;
    *  3. keep rule: a row is dropped iff a LOWER-id cluster-mate lies
    *     within `threshold` cosine — deterministic, transitive-free, and
    *     independent of execution order.
    *
    * `nCentroids = 1` is the provable parameter point: one cell makes the
    * candidate set ALL pairs, so the result equals exact threshold dedup
    * (the point the q72 oracle checks). Larger codebooks trade recall for
    * work exactly as SemDeDup deployments do. `maxCellSize` caps degenerate
    * cells (an all-near-identical corpus collapses into one cell whose
    * self-join is quadratic) with a logged drop — run exact dedup first,
    * the standard ordering. Returns the kept rows with original columns. */
  def semDedup(corpus: DataFrame, id: String, vec: String, threshold: Double,
      nCentroids: Int = 64, roundTo: Int = 6, kMeansIterations: Int = 0,
      maxCellSize: Int = 100000): DataFrame = {
    val reserved = Seq("__cell", "__id_a", "__id_b", "__vec_a", "__vec_b")
    require(!reserved.contains(id) && !reserved.contains(vec),
      s"semDedup reserves column names ${reserved.mkString(",")}")
    GraftFunctions.register(corpus.sparkSession)
    val cents = kMeansRefine(corpus, vec,
      sampleCodebook(corpus, id, vec, nCentroids), kMeansIterations)
    val assigned0 = corpus.select(col(id), col(vec),
      element_at(nearestCells(cents, col(vec), 1), 1).as("__cell"))
    val assigned = graft.ops.Ops.capGroupSize(assigned0, Seq("__cell"), id,
      maxCellSize, s"semDedup(threshold=$threshold)")
    val l = assigned.select(col("__cell"), col(id).as("__id_a"), col(vec).as("__vec_a"))
    val r = assigned.select(col("__cell"), col(id).as("__id_b"), col(vec).as("__vec_b"))
    val dupIds = l.join(r, Seq("__cell"))
      .filter(col("__id_b") < col("__id_a") &&
        round(GraftFunctions.cosineSim(col("__vec_a"), col("__vec_b")), roundTo)
          >= threshold)
      .select(col("__id_a").as(id)).distinct()
    corpus.join(dupIds, Seq(id), "left_anti")
  }

  /** Exact cosine-threshold pairs via broadcast (small/medium corpus, or one
    * side pre-filtered): the exact counterpart used to validate
    * [[cosinePairsLsh]] recall. */
  def cosinePairsExact(
      corpus: DataFrame,
      id: String,
      vec: String,
      threshold: Double,
      roundTo: Int = 6): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val l = corpus.select(col(id).as("id_a"), col(vec).as("vec_a"))
    val r = corpus.select(col(id).as("id_b"), col(vec).as("vec_b"))
    l.crossJoin(broadcast(r))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(GraftFunctions.cosineSim(col("vec_a"), col("vec_b")), roundTo))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  // -------------------------------------------------------------------
  // IVF with a LITERAL double codebook — the replayable face of ivfTopK's
  // coarse quantizer, and the assignment half of the composed IVF+PQ
  // retrieval (q155): at deployment scale the trained centroids are a tiny
  // constant shipped into the plan (the pqCodebooks convention), cell
  // assignment is a map-only argmax fused into the scan, and the index
  // table (id, cell, code) is written PARTITIONED BY cell so a query's
  // probes prune to nProbe/nCentroids of the files before a single byte of
  // code column is read. Scoring is cosine with the per-centroid norm
  // precomputed in Scala: score_j = (v · c_j) / ‖c_j‖ — the vector's own
  // norm is constant across cells and dropped, so both engines replay the
  // argmax with one dot product and one literal division per cell.

  /** Per-cell NEGATED scores as (ns, c) structs: min(ns) = max(score),
    * struct tie-break = lowest cell index. Shared by assignment and probe
    * selection, which MUST agree on the rule. */
  private def cellNegScores(cents: Seq[Seq[Double]], v: Column): Column =
    array(cents.zipWithIndex.map { case (c, j) =>
      val norm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      struct((lit(0.0) - Quantize.dot(v, lit(c.toArray)) / lit(norm)).as("ns"),
        lit(j).as("c"))
    }: _*)

  /** Nearest-centroid cell index (0-based) for a vector column under a
    * literal codebook — ties to the LOWEST index. Map-only; no Exchange
    * between scan and assignment. A vector whose length differs from the
    * centroids' yields a null cell (zip_with pads with null and the dot
    * propagates it) — it lands in no partition rather than a wrong one. */
  def ivfCellAssign(v: Column, cents: Seq[Seq[Double]]): Column = {
    require(cents.nonEmpty, "ivfCellAssign needs at least one centroid")
    require(cents.forall(_.length == cents.head.length),
      "centroids differ in length")
    array_min(cellNegScores(cents, v.cast("array<double>"))).getField("c")
  }

  /** The `nProbe` nearest cells for ONE query vector, computed driver-side
    * (the query is a single vector by contract — O(centroids) work, no
    * job): same score, same (score desc, index asc) order as
    * [[ivfCellAssign]], identical left-to-right IEEE double arithmetic, so
    * an engine replaying `-(q·c_j)/‖c_j‖` ranks the same cells. */
  def ivfProbeCells(qv: Seq[Double], cents: Seq[Seq[Double]],
      nProbe: Int): Seq[Int] = {
    require(nProbe >= 1 && nProbe <= cents.size,
      s"nProbe must be in [1, ${cents.size}], got $nProbe")
    cents.zipWithIndex.map { case (c, j) =>
      require(c.length == qv.length,
        s"centroid $j has dim ${c.length}, query has ${qv.length}")
      val norm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      val dot = c.zip(qv).foldLeft(0.0)((a, p) => a + p._1 * p._2)
      (-(dot / norm), j)
    }.sorted.take(nProbe).map(_._2)
  }

  /** [[ivfProbeCells]] for a COLUMN of query vectors — the batched-probe
    * face ([[graft.sim.IvfPqIndex.searchAll]]): array of the `nProbe`
    * nearest cell ids per row, map-only over the probe frame. Shares
    * [[cellNegScores]] with [[ivfCellAssign]] and ranks by the identical
    * (score desc, index asc) rule as the driver-side form — `array_sort`
    * over (ns, c) structs IS that order — so a probe table and a single
    * literal query can never disagree on which cells a vector probes.
    *
    * A null or length-mismatched probe vector makes every struct's `ns`
    * null (the dot propagates it) while `c` stays a literal — array_sort
    * would then rank those structs FIRST and resolve the probe to
    * arbitrary low-index cells, so each slot re-pins to a null cell id:
    * degenerate probes land in no partition, the same contract as
    * [[ivfCellAssign]], and downstream null-cell guards stay live. */
  def ivfProbeCellsCol(v: Column, cents: Seq[Seq[Double]],
      nProbe: Int): Column = {
    require(nProbe >= 1 && nProbe <= cents.size,
      s"nProbe must be in [1, ${cents.size}], got $nProbe")
    transform(
      slice(array_sort(cellNegScores(cents, v.cast("array<double>"))),
        1, nProbe),
      s => when(s.getField("ns").isNotNull, s.getField("c")))
  }

  /** X67 — late-interaction MaxSim retrieval (Khattab & Zaharia SIGIR'20,
    * ColBERT): documents and queries are BAGS of vectors (one per token /
    * chunk / frame), and a document's score for a query is
    * Σ_{qt ∈ query} max_{dt ∈ doc} cos(qt, dt) — each query token finds
    * its best-matching document token independently, which preserves
    * term-level matching that single-vector retrieval collapses (the
    * reason reranker stacks keep a late-interaction stage between the
    * bi-encoder and the cross-encoder). Multimodal shapes fit the same
    * frame: video = bag of frame embeddings, a match is "some frame
    * matches each query aspect".
    *
    * Input: `docTokens` one row per document token, `queryTokens` one row
    * per query token (ids + a token ordinal + the vector). Output:
    * `(query_id, neighbor_id, score_micro, rank)`, rank 1..k per query by
    * (score desc, id asc).
    *
    * Scale shape: the query side broadcasts (queries×tokens — the probe
    * table contract of [[bruteForceTopK]]); the corpus-token side is
    * scanned once, never shuffled at corpus width — the per-(query, doc,
    * qtok) maxima aggregate with map-side combine down to candidates×
    * |qtok| rows, the per-(query, doc) sums to candidates, and the top-k
    * runs through [[topKPerKey]]'s bounded heaps. For corpora too large
    * to late-interact in full, pre-filter `docTokens` to an ANN candidate
    * set ([[ivfTopK]] / [[graft.sim.IvfPqIndex.searchAll]] on a pooled
    * vector) and MaxSim only the survivors — the published ColBERT
    * serving layout.
    *
    * Determinism: cosines round to `roundTo` then max (order-free), the
    * per-query-token maxima re-pin to exact integer micros before the
    * sum (order-free), so scores are bit-stable under partitioning and
    * engine-portable. NaN cosines (zero-norm tokens) are dropped before
    * the max, mirroring [[topKPerKey]]'s stance; a query token whose
    * every candidate cosine is NaN contributes nothing to that pair. */
  def maxSimTopK(docTokens: DataFrame, docId: String, docVec: String,
      queryTokens: DataFrame, queryId: String, queryTokId: String,
      queryVec: String, k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(roundTo >= 1 && roundTo <= 6,
      s"roundTo must be in [1, 6] (micro re-pin), got $roundTo")
    GraftFunctions.register(docTokens.sparkSession)
    val q = queryTokens.select(col(queryId).as("__query_id"),
      col(queryTokId).as("__qtok"), col(queryVec).as("__qvec"))
    val best = docTokens.crossJoin(broadcast(q))
      .select(col("__query_id"), col(docId).as("neighbor_id"), col("__qtok"),
        round(GraftFunctions.cosineSim(col("__qvec"), col(docVec)), roundTo)
          .as("__sim"))
      .filter(!isnan(col("__sim")))
      .groupBy(col("__query_id"), col("neighbor_id"), col("__qtok"))
      .agg(max(col("__sim")).as("__best"))
    val scored = best
      .groupBy(col("__query_id"), col("neighbor_id"))
      .agg(sum(round(col("__best") * 1e6).cast("long")).as("__score"))
      .select(col("__query_id"), col("neighbor_id"),
        col("__score").cast("double").as("sim"))
    topKPerKey(scored, "__query_id", k)
      .select(col("__query_id").as("query_id"), col("neighbor_id"),
        col("sim").cast("long").as("score_micro"), col("rank"))
  }

  /** The Achlioptas sparse projection matrix, row j = output dimension j:
    * entry (j, i) is +1/−1 with probability 1/6 each, 0 with probability
    * 2/3 (Achlioptas JCSS'03 — the database-friendly JL family: the same
    * distance-preservation guarantee as Gaussian projections with 2/3 of
    * the multiplies gone), drawn from the sampling family's md5-uniform of
    * `"rp:seed:j:i"` mod 6 — deterministic, engine-replayable, identical
    * under task retries. Public so audits and oracles can rebuild the
    * exact matrix; the √(3/outDim) scale that completes the transform
    * lives in [[randomProject]]. */
  def projectionMatrix(inDim: Int, outDim: Int,
      seed: String): Array[Array[Double]] = {
    require(inDim >= 1 && outDim >= 1,
      s"dims must be positive, got in=$inDim out=$outDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      md.reset()
      val hex = md.digest(s"rp:$seed:$j:$i".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 6 match {
        case 0 => 1.0
        case 1 => -1.0
        case _ => 0.0
      }
    }
  }

  /** Johnson–Lindenstrauss dimensionality reduction: project `v` (length
    * `inDim`) to `outDim` dimensions through the sparse ±1 matrix above,
    * scaled by √(3/outDim) so expected squared distances are preserved.
    * Output dim j = that scale times the [[graft.functions.DotProduct]]
    * of the vector against LITERAL row j — outDim codegen'd multiply-add
    * loops fused into the scan, map-only, no shuffle, no UDF. This is the
    * standard pre-ANN shrink: a 64→16 projection cuts X3/X34's per-pair
    * cost 4× while JL bounds the rank damage, and the PROJECTED space is
    * where LSH/IVF then operate. Length-mismatched or null vectors yield
    * null entries (the DotProduct null contract) rather than a wrong
    * projection. Matrix size outDim·inDim lives in the PLAN as literals —
    * fine for projection targets (k ≤ a few hundred), the same
    * literal-codebook stance as [[ivfCellAssign]]. */
  def randomProject(v: Column, inDim: Int, outDim: Int,
      seed: String): Column = {
    val m = projectionMatrix(inDim, outDim, seed)
    val scale = math.sqrt(3.0 / outDim)
    array(m.map(row =>
      Quantize.dot(v.cast("array<double>"), lit(row)) * lit(scale)): _*)
  }

  /** X133 — MMR diversity re-ranking (maximal marginal relevance;
    * Carbonell & Goldstein SIGIR'98): the serving-stack step AFTER
    * retrieval (X3's ANN ladder, X19/X72's BM25, X68's RRF fusion)
    * hands back a relevance-ordered candidate list — a RAG context
    * window or dedup-aware result page wants the top k that are
    * relevant AND mutually diverse, not five paraphrases of the same
    * document. Greedy MMR: pick argmax of
    * `λ·rel − (1−λ)·max_{s∈selected} sim(c, s)` k times (the first pick
    * has an empty selected set — its diversity term is 0).
    *
    * Exactness: `rel` arrives in integer micros; pairwise cosine rounds
    * to integer micros through the SAME left-to-right float→double
    * accumulation as [[graft.functions.CosineSimilarity]] (the q31
    * oracle-parity chain: `round(1e6·dot/(√nx·√ny))`); the MMR score is
    * then exact integers — `(λ_µ·rel_µ − (1e6−λ_µ)·maxSim_µ) DIV 1e6`,
    * truncating toward zero — and ties break to the SMALLEST id, so the
    * greedy trajectory is fully deterministic and an engine replays it
    * with a recursive CTE carrying the selected-id list. Zero-norm
    * vectors are REFUSED up front (their cosine is NaN, which would
    * poison the argmax silently).
    *
    * Scale shape: candidates are a RE-RANKING set, not a corpus — the
    * driver fold collects ≤ `maxCandidates` rows per query group
    * (refused beyond; retrieval's top-N upstream is what bounds it, the
    * [[graft.ops.Markov]] bounded-collect stance) and computes
    * O(k·n) similarities per group ([[mmrGreedy]]'s running
    * max-similarity cache — each remaining candidate re-scores against
    * only the NEWEST pick per round, never the full selected set, and
    * never the full n²). Output: one row per pick —
    * `(queryCols…, id, rank, rel_micro, score_micro)`. */
  def mmrRerank(candidates: DataFrame, queryCols: Seq[String], id: Column,
      relMicro: Column, vec: Column, k: Int, lambdaMicro: Long,
      maxCandidates: Int = 1000): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    require(lambdaMicro >= 0 && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1e6], got $lambdaMicro")
    require(maxCandidates >= k && maxCandidates <= 10000,
      s"maxCandidates must be in [k, 10000], got $maxCandidates")
    val base = candidates.select(queryCols.map(col) :+
        id.cast("long").as("__id") :+ relMicro.cast("long").as("__rel") :+
        vec.cast("array<double>").as("__v"): _*)
      .filter(col("__id").isNotNull && col("__rel").isNotNull &&
        col("__v").isNotNull)
    // ONE probe serves both budgets: the per-group cap (the quadratic
    // axis) and the TOTAL driver collect (a million query groups ×
    // bounded candidates is still a corpus-shaped collect — re-rank
    // per-request batches, not the full query log)
    val probe = base.groupBy(queryCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx"), sum(col("__n")).as("__tot"))
      .collect()(0)
    require(!probe.isNullAt(0), "mmrRerank: no candidates")
    require(probe.getLong(0) <= maxCandidates,
      s"a query group holds ${probe.getLong(0)} candidates " +
        s"(> $maxCandidates) — MMR re-ranks a retrieval top-N, not a " +
        "corpus; cut upstream")
    require(probe.getLong(1) <= 1000000L,
      s"${probe.getLong(1)} total candidate rows exceed the 1e6 driver " +
        "budget — re-rank per-request batches, not the whole query log")
    val rows = base.collect()
    val groups = rows.groupBy(r => queryCols.indices.map(r.get).toVector)
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      // ONE stated association — 1e6·(dot/den), the CosineSimilarity
      // expression's own quotient first — so the oracle's replay chain
      // is identical op for op
      math.round(1e6 * (dot / (math.sqrt(nx) * math.sqrt(ny))))
    }
    val out = Vector.newBuilder[(Vector[Any], Long, Long, Long, Long)]
    groups.foreach { case (key, grs) =>
      val cand = grs.map { r =>
        val v = r.getSeq[Double](queryCols.length + 2).toArray
        require(v.exists(_ != 0.0),
          s"zero-norm vector at id ${r.getLong(queryCols.length)} — " +
            "cosine is undefined there; filter upstream")
        (r.getLong(queryCols.length), r.getLong(queryCols.length + 1), v)
      }.sortBy(_._1)
      mmrGreedy(cand.toVector, k, lambdaMicro, cosMicro).foreach {
        case (rank, cid, rel, score) => out += ((key, cid, rank, rel, score))
      }
    }
    val spark = candidates.sparkSession
    import spark.implicits._
    val schema = base.select(queryCols.map(col): _*).schema
    val result = out.result()
    val rowsOut = result.map { case (key, cid, rank, rel, score) =>
      org.apache.spark.sql.Row.fromSeq(key ++ Seq(cid, rank, rel, score))
    }
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields ++
      Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rel_micro",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score_micro",
          org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rowsOut: _*), outSchema)
  }

  /** The greedy MMR trajectory for ONE candidate group (cosine injected —
    * the spec counts evaluations through it): emits
    * `(rank, id, rel, score)` picks in rank order. Each remaining
    * candidate carries a RUNNING max-similarity that updates against only
    * the newly selected vector per round — max is associative, so the
    * cached value equals a full re-scan of the selected set bit for bit,
    * at O(k·n) total cosine evaluations (the documented complexity; the
    * naive rescan is O(k²·n)). Candidates must arrive sorted by id (the
    * tie-break order). */
  private[sim] def mmrGreedy(cand: Vector[(Long, Long, Array[Double])],
      k: Int, lambdaMicro: Long,
      cos: (Array[Double], Array[Double]) => Long):
      Vector[(Long, Long, Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long, Long, Long)]
    // Long.MinValue = "no similarities yet": the first pick's diversity
    // term is 0 by definition, but from the second round on the max must
    // be the TRUE max over selected — which can be NEGATIVE, so a 0
    // initializer would silently clamp it
    var remaining = cand.map { case (cid, rel, v) =>
      (cid, rel, v, Long.MinValue)
    }
    var lastPicked: Array[Double] = null
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      if (lastPicked != null) {
        val p = lastPicked
        remaining = remaining.map { case (cid, rel, v, m) =>
          (cid, rel, v, math.max(m, cos(v, p)))
        }
      }
      val scored = remaining.map { case (cid, rel, v, m) =>
        val maxSim = if (m == Long.MinValue) 0L else m
        val score =
          (lambdaMicro * rel - (1000000L - lambdaMicro) * maxSim) / 1000000L
        (cid, rel, v, score)
      }
      val pick = scored.minBy { case (cid, _, _, sc) => (-sc, cid) }
      out += ((rank, pick._1, pick._2, pick._4))
      lastPicked = pick._3
      remaining = remaining.filterNot(_._1 == pick._1)
      rank += 1
    }
    out.result()
  }

  /** X170 — embedding distribution drift report: did the EMBEDDING
    * SPACE move between two snapshots, per family? —
    * [[graft.ops.Ops.psi]] watches scalar columns; a model/encoder
    * swap, a crawl-source shift, or an upstream preprocessing change
    * shows up first as a moved centroid or a changed dispersion in
    * embedding space (the train/serve skew check an embedding-indexed
    * corpus needs before ANN recall quietly degrades). Per family:
    * the cosine between the two snapshots' CENTROIDS (scale-invariant,
    * so raw per-dimension sums stand in for means) and each snapshot's
    * DISPERSION (mean cosine of a vector to its own centroid — 1 =
    * collapsed to a ray, lower = spread), plus the shift.
    *
    * Exactness discipline: a distributed FLOAT sum is order-dependent,
    * so elements are pinned to integer micros FIRST — ONE stated chain
    * per element (`round(double(v)·1e6)`) — and every cross-row sum
    * (per-dimension centroid sums, per-row dot products against the
    * centroid, dispersion means) rides exact DECIMAL(38,0); the only
    * doubles are the final stated cosine chains over exact integer
    * operands (the q30 two-sqrt discipline), and the dispersion mean
    * is an integer mean of per-row ROUNDED chains (`Σcos_micro DIV
    * n`, stated).
    *
    * Rules, each STATED: NULL vectors drop (censused out); RAGGED
    * dimensions REFUSE (mixed encoder outputs are a pipeline bug, not
    * a drift signal); zero vectors carry no angle — they drop from
    * the dispersion mean (their count still rides n_old/n_new); a
    * zero CENTROID (perfectly cancelling snapshot) → NULL cosine and
    * dispersion, never a fake 0; an empty side → NULL comparisons.
    * Budget: |element| ≤ 1e3 and n ≤ 1e8 per side keep every product
    * inside DECIMAL(38,0) — micro elements ≤ 1e9, dimension sums ≤
    * 1e17, squared ≤ 1e34, and the over-dims norm sum stays under
    * 1e38 up to ~10⁴ dimensions — REFUSED above.
    *
    * Scale shape: one posexplode per side (rows×dims — dims are a
    * small constant), ONE (family, side, dim) keyed aggregation with
    * map-side combine, one (family, side, dim)-keyed join of the
    * exploded frame against the dim-sized centroid frame for the
    * per-row dots, two rollups — no self-joins, no windows, no driver
    * state. Output: one row per family — `(families…, n_old, n_new,
    * dims, centroid_cos_micro, disp_old_micro, disp_new_micro,
    * disp_shift_micro)`. */
  def embeddingDrift(oldDf: DataFrame, newDf: DataFrame,
      families: Seq[String], id: Column, vec: Column): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val fam = families.map(col)
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(fam :+ lit(tag).as("__side") :+
          id.cast("long").as("__rid") :+ vec.as("__v"): _*)
        .filter(col("__v").isNotNull)
    val base = side(oldDf, 0).unionByName(side(newDf, 1))
      .withColumn("__vm", transform(col("__v"),
        x => round(x.cast("double") * 1000000d).cast("long")))
      .drop("__v")
      .persist()
    try {
      val dims = base.select(size(col("__vm")).as("__d")).distinct()
        .limit(2).collect()
      require(dims.length <= 1,
        "embeddingDrift: ragged vector dimensions — mixed encoder " +
          "outputs are a pipeline bug, not a drift signal")
      // the doc's dims half of the budget, enforced (ADVICE r17): the
      // over-dims norm sum Σ_d S² only fits DECIMAL(38,0) to ~1e4
      // dimensions — above that it would surface as a silent NULL
      // cosine instead of this stated refusal
      require(dims.isEmpty || dims.head.getInt(0) <= 10000,
        "embeddingDrift: vectors exceed 1e4 dimensions — the " +
          "DECIMAL(38) over-dims norm-sum budget; project down " +
          "(e.g. sparseRandomProjection) upstream")
      val census = base.groupBy(fam :+ col("__side"): _*)
        .agg(count(lit(1)).as("__n"),
          max(expr("array_max(transform(__vm, x -> abs(x)))"))
            .as("__mx"))
      val over = census.filter(col("__n") > 100000000L ||
          col("__mx") > 1000000000L).limit(1).collect()
      require(over.isEmpty,
        "embeddingDrift: a side exceeds 1e8 vectors or |element| > 1e3 " +
          "— the DECIMAL(38) centroid budget; rescale or sample upstream")
      val exploded = base.select(fam :+ col("__side") :+ col("__rid") :+
          posexplode(col("__vm")).as(Seq("__dim", "__e")): _*)
      val cent = exploded
        .groupBy(fam :+ col("__side") :+ col("__dim"): _*)
        .agg(sum(col("__e").cast(d)).as("__S"))
        .persist()
      try {
        val norms = cent.groupBy(fam :+ col("__side"): _*)
          .agg(sum(col("__S") * col("__S")).as("__N2"),
            count(lit(1)).as("__nd"))
        val c0 = cent.filter(col("__side") === 0)
          .select(fam :+ col("__dim") :+ col("__S").as("__S0"): _*)
        val c1 = cent.filter(col("__side") === 1)
          .select(fam :+ col("__dim") :+ col("__S").as("__S1"): _*)
        val cross = c0.join(c1, families :+ "__dim")
          .groupBy(fam: _*)
          .agg(sum(col("__S0") * col("__S1")).as("__dot"))
        val rowAgg = exploded
          .join(cent, families ++ Seq("__side", "__dim"))
          .groupBy(fam :+ col("__side") :+ col("__rid"): _*)
          .agg(sum(col("__e").cast(d) * col("__S")).as("__vd"),
            sum(col("__e").cast(d) * col("__e")).as("__vv"))
        val disp = rowAgg
          .join(norms.select(fam :+ col("__side") :+ col("__N2"): _*),
            families :+ "__side")
          .withColumn("__cr", expr(
            """CAST(CASE WHEN __vv > 0 AND __N2 > 0 THEN
              |  round(1000000 * CAST(__vd AS DOUBLE)
              |    / (sqrt(CAST(__vv AS DOUBLE))
              |       * sqrt(CAST(__N2 AS DOUBLE)))) END AS BIGINT)"""
              .stripMargin))
          .filter(col("__cr").isNotNull)
          .groupBy(fam :+ col("__side"): _*)
          .agg(count(lit(1)).as("__nc"),
            sum(col("__cr").cast(d)).as("__sc"))
          .withColumn("__disp", expr(
            """CAST((__sc - __sc % __nc) / __nc AS BIGINT)"""))
        def pick(dfIn: DataFrame, tag: Int, cols: Map[String, String])
            : DataFrame =
          dfIn.filter(col("__side") === tag)
            .select(fam ++ cols.map { case (from, to) =>
              col(from).as(to) }: _*)
        val nOld = pick(census, 0, Map("__n" -> "n_old"))
        val nNew = pick(census, 1, Map("__n" -> "n_new"))
        val n20 = pick(norms, 0, Map("__N2" -> "__N20"))
        val n21 = pick(norms, 1, Map("__N2" -> "__N21"))
        val d0 = pick(disp, 0, Map("__disp" -> "disp_old_micro"))
        val d1 = pick(disp, 1, Map("__disp" -> "disp_new_micro"))
        val dimCol = base.groupBy(fam: _*)
          .agg(max(size(col("__vm"))).as("dims"))
        nOld.join(nNew, families.toSeq, "full")
          .join(dimCol, families.toSeq, "left")
          .join(cross, families.toSeq, "left")
          .join(n20, families.toSeq, "left")
          .join(n21, families.toSeq, "left")
          .join(d0, families.toSeq, "left")
          .join(d1, families.toSeq, "left")
          .withColumn("centroid_cos_micro", expr(
            """CAST(CASE WHEN __N20 > 0 AND __N21 > 0 THEN
              |  round(1000000 * CAST(__dot AS DOUBLE)
              |    / (sqrt(CAST(__N20 AS DOUBLE))
              |       * sqrt(CAST(__N21 AS DOUBLE)))) END AS BIGINT)"""
              .stripMargin))
          .withColumn("disp_shift_micro",
            col("disp_new_micro") - col("disp_old_micro"))
          .select(fam :+ coalesce(col("n_old"), lit(0L)).as("n_old") :+
            coalesce(col("n_new"), lit(0L)).as("n_new") :+
            col("dims").cast("long").as("dims") :+
            col("centroid_cos_micro") :+ col("disp_old_micro") :+
            col("disp_new_micro") :+ col("disp_shift_micro"): _*)
          .localCheckpoint(true)
      } finally cent.unpersist()
    } finally base.unpersist()
  }
}
