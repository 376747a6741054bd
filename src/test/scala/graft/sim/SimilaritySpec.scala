package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("cosine_sim native expression matches the analytic value") {
    GraftFunctions.register(spark)
    val sim = vecs.filter(col("vec_id") === 0).crossJoin(
        vecs.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(GraftFunctions.cosineSim(col("embedding"), col("e2")).as("s"))
      .as[Double].head()
    val expected = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(sim - expected) < 1e-6)
  }

  test("cosine_sim handles array<double> corpora and mixed element types") {
    GraftFunctions.register(spark)
    val dvecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)), (3L, Array(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    // double ⊗ double through the whole brute-force path
    val q = dvecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(dvecs, "vec_id", "embedding",
        q, "query_id", "qvec", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
    // double corpus ⊗ float literal codebook (the ivfTopK mixed case)
    val ivf = Similarity.ivfTopK(dvecs, "vec_id", "embedding",
        q, "query_id", "qvec", k = 2, nCentroids = 4, nProbe = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(ivf == Seq(1L, 2L))
  }

  test("cosine_sim returns null for mismatched-length vectors (never a prefix cosine)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s")
      .select("s").collect()(0)
    assert(r.isNullAt(0))
    // and a filter never promotes it past a threshold
    val n = spark.sql(
      "SELECT 1 WHERE cosine_sim(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) >= 0.0").count()
    assert(n == 0)
  }

  test("cosine_sim is usable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s").as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by sim desc with id tie-break (X3)") {
    val queries = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L)) // 1 most similar; 2 and 3 tie at 0 -> lower id
  }

  test("knnClassify votes the cluster label, with deterministic tie-break") {
    // three separated clusters on the axes, labels 0/1/2, 4 members each
    val corpus = (0 until 12).map { i =>
      val axis = i % 3
      val base = Array(0.0f, 0.0f, 0.0f)
      base(axis) = 1.0f
      base((axis + 1) % 3) = 0.05f * (i / 3) // small within-cluster spread
      (i.toLong, base.toSeq, axis)
    }.toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, Seq(0.95f, 0.02f, 0.0f)), // cluster 0
      (101L, Seq(0.0f, 1.0f, 0.03f))   // cluster 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(corpus, "vec_id", "embedding", "label",
        queries, "vec_id", "embedding", k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((100L, 0L, 3L), (101L, 1L, 3L)))

    // split vote: the 8 nearest of an xy-diagonal query are the full
    // clusters 0 and 1 (cluster 2 is near-orthogonal), 4 votes each — the
    // tie must go to the SMALLER label, not an arbitrary one
    val diag = Seq((200L, Seq(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tied = Similarity.knnClassify(corpus, "vec_id", "embedding", "label",
        diag, "vec_id", "embedding", k = 8)
      .as[(Long, Long, Long)].head()
    assert(tied._2 == 0L && tied._3 == 4L, s"tie must break to label 0: $tied")

    // unrelated probe table sharing id values with the corpus: with
    // excludeSelf=false the id-colliding corpus row still votes (probe id 0
    // vs corpus id 0 are different entities here)
    val probe = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val full = Similarity.knnClassify(corpus, "vec_id", "embedding", "label",
        probe, "vec_id", "embedding", k = 4, excludeSelf = false)
      .as[(Long, Long, Long)].head()
    assert(full == ((0L, 0L, 4L)), s"corpus row 0 must vote: $full")
  }

  test("cosinePairsExact finds the one high-sim pair") {
    val pairs = Similarity.cosinePairsExact(vecs, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("cosinePairsLsh achieves full recall on well-separated vectors") {
    val pairs = Similarity.cosinePairsLsh(vecs, "vec_id", "embedding",
        threshold = 0.9, bands = 16, rowsPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ivfTopK with nProbe = nCentroids equals exact brute force (q38 invariant)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, nCentroids = 8, nProbe = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(full == exact)
    // partial probing returns k results per query with nonzero recall
    val partial = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, nCentroids = 8, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(partial.size == 15)
    assert((partial intersect exact.map(t => (t._1, t._2))).nonEmpty)
  }

  test("kMeansRefine keeps cell ids, unit norms, and the full-probe invariant") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.functions.GraftFunctions.register(spark)
    val initial = Similarity.sampleCodebook(emb, "vec_id", "embedding", 8)
    val refined = Similarity.kMeansRefine(emb, "embedding", initial, iterations = 2)
    assert(refined.map(_._1) == initial.map(_._1)) // stable cell ids
    refined.foreach { case (_, v) =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"centroid not renormalized: $norm")
    }
    // refinement is deterministic: same input -> same codebook bits
    val again = Similarity.kMeansRefine(emb, "embedding", initial, iterations = 2)
    assert(refined == again)
    // the degenerate-probe exactness invariant is codebook-independent
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val refinedFull = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, nCentroids = 8, nProbe = 8,
        kMeansIterations = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(refinedFull == exact)
  }

  test("lsh recall on fixture embeddings vs exact pairs (q31/q32 invariant)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosinePairsExact(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 16 × 4 = 64 planes — the maximum a one-long signature holds (more
    // would alias bands; lshSignatures now rejects it)
    val lsh = Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.45,
        bands = 16, rowsPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must produce no false positives (exact rerank)")
    assert(lsh.size >= (exact.size * 0.7).toInt, s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("lshSignature yields null for null/empty vectors under ANSI and legacy") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f))), (2L, Some(Seq.empty[Float])), (3L, None)
    ).toDF("id", "v")
    def sigs = df.select(col("id"), Similarity.lshSignature(col("v"), 8).as("sig"))
      .orderBy("id").select("sig").collect().map(r => Option(r.get(0))).toSeq
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false") // legacy: size(null) = -1
      assert(sigs.head.nonEmpty && sigs(1).isEmpty && sigs(2).isEmpty)
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(sigs.head.nonEmpty && sigs(1).isEmpty && sigs(2).isEmpty)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("ivfTopK rejects a non-integral id column with the id contract") {
    val emb = Seq(("a", Seq(1.0f, 0.0f)), ("b", Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        "query_id", "qvec", k = 1, nCentroids = 2, nProbe = 2))
    assert(e.getMessage.contains("integral"))
  }

  test("semDedup drops lower-id-dominated near-dups; clustered path is a subset") {
    // two tight neighborhoods on the unit circle plus a singleton
    def unit(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val emb = Seq(
      (1L, unit(0)), (2L, unit(2)), (3L, unit(4)),      // cluster A, near-dups
      (10L, unit(90)), (11L, unit(91)),                 // cluster B, near-dups
      (20L, unit(200))                                  // singleton
    ).toDF("vec_id", "embedding")
    // provable point: one cell = exact threshold dedup, lowest id survives
    val exact = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 1)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(exact == Seq(1L, 10L, 20L))
    // clustered path: kept set contains the exact survivors (a cluster
    // boundary can only MISS pairs, never invent them) and all columns ride
    val clustered = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 3)
    assert(clustered.columns.toSeq == Seq("vec_id", "embedding"))
    val kept = clustered.select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept.toSet.subsetOf(Set(1L, 2L, 3L, 10L, 11L, 20L)))
    assert(Set(1L, 10L, 20L).subsetOf(kept.toSet))
    // determinism: same call twice, same survivors
    val again = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 3)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(again == kept)
  }

  test("semDedup caps degenerate cells with a logged drop (no quadratic blowup)") {
    // 50 identical vectors: one cell, one near-dup class; cap at 10 still
    // completes and keeps exactly the lowest id among surviving candidates
    val emb = (1L to 50L).map(i => (i, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 1, maxCellSize = 10)
      .select("vec_id").as[Long].collect().sorted.toSeq
    // rows beyond the cap are dropped from CANDIDACY, not from the corpus:
    // ids 11-50 never join a pair, so they survive alongside id 1
    assert(kept == 1L +: (11L to 50L))
  }

  test("hardNegatives: cross-label only, closest wrong answer first (X58)") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), Some(0)),
      (2L, Array(1.0f, 0.0f), Some(0)),   // sim 1.0 but SAME label: excluded
      (3L, Array(0.9f, 0.1f), Some(1)),   // nearest wrong answer
      (4L, Array(0.0f, 1.0f), Some(2)),   // far wrong answer
      (5L, Array(1.0f, 0.0f), Option.empty[Int]) // null label: never a negative
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(rows, "vec_id", "embedding", "label",
        rows.filter(col("vec_id") === 1L), k = 2)
      .orderBy("rank")
      .select("neighbor_id", "neg_label", "rank")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((3L, 1, 1), (4L, 2, 2)))
    // a null-label PROBE mines nothing (its wrong answers are unknowable)
    assert(Similarity.hardNegatives(rows, "vec_id", "embedding", "label",
      rows.filter(col("vec_id") === 5L), k = 2).count() == 0L)
  }

  test("marginScores: ratio margin demotes hub pairs, exact on a hand fixture") {
    // t2 = (0.6, 0.8) is the "hub": fairly close to BOTH probes. The raw
    // cosine ranks (s2,t2)=0.8 above nothing useful; the margin must rank
    // the true alignments (s1,t1) and (s2,t3) clearly above the hub pairs.
    val src = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((11L, Seq(1.0f, 0.0f)), (12L, Seq(0.6f, 0.8f)),
      (13L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.marginScores(src, "vec_id", "embedding",
        tgt, "vec_id", "embedding", k = 2)
      .orderBy("src_id", "tgt_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // hand arithmetic: avgNN2(s1)=0.8, avgNN2(s2)=0.9,
    // avgNN2(t1)=0.5, avgNN2(t2)=0.7, avgNN2(t3)=0.5
    assert(out == Seq(
      (1L, 11L, 1.0, 1.538462),   // 1.0 / ((0.8+0.5)/2)
      (1L, 12L, 0.6, 0.8),        // 0.6 / ((0.8+0.7)/2)
      (2L, 12L, 0.8, 1.0),        // 0.8 / ((0.9+0.7)/2) — the hub pair
      (2L, 13L, 1.0, 1.428571)))  // 1.0 / ((0.9+0.5)/2)
    // k beyond the corpus: penalties divide by the TRUE neighbor count
    val wide = Similarity.marginScores(src, "vec_id", "embedding",
      tgt, "vec_id", "embedding", k = 5)
    assert(wide.count() == 6L &&
      wide.filter(col("margin").isNull).isEmpty)
    // (s1,t1) margin with k=5: 1.0 / ((1.6/3 + 1.0/2) / 2)
    val m = wide.filter(col("src_id") === 1L && col("tgt_id") === 11L)
      .select("margin").as[Double].head()
    assert(m == BigDecimal(1.0 / ((1.6 / 3 + 0.5) / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    intercept[IllegalArgumentException](Similarity.marginScores(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding", k = 0))
  }

  test("marginScores: zero-background neighborhoods yield NULL, not NaN/Inf") {
    // each probe's top-2 sims are {+1, -1} (rounded), so every penalty is
    // 0 and every denominator is 0 — the margin must be NULL for all pairs
    val src = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((11L, Seq(1.0f, 0.0f)), (12L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.marginScores(src, "vec_id", "embedding",
      tgt, "vec_id", "embedding", k = 2)
    assert(out.count() == 4L)
    assert(out.filter(col("margin").isNotNull).isEmpty)
    // and no NaN sneaks through under a different name
    assert(out.filter(isnan(col("margin"))).isEmpty)
  }

  test("maxSimTopK: hand arithmetic, NaN tokens dropped, rank order (X67)") {
    // doc 10: {e1, e2}; doc 20: {-e1, (0.6, 0.8)}; query 1: {e1, e2}
    val docToks = Seq(
      (10L, Seq(1.0f, 0.0f)), (10L, Seq(0.0f, 1.0f)),
      (20L, Seq(-1.0f, 0.0f)), (20L, Seq(0.6f, 0.8f))
    ).toDF("doc_id", "vec")
    val qToks = Seq((1L, 0, Seq(1.0f, 0.0f)), (1L, 1, Seq(0.0f, 1.0f)))
      .toDF("q_id", "tok", "vec")
    val got = Similarity.maxSimTopK(docToks, "doc_id", "vec",
        qToks, "q_id", "tok", "vec", k = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(_._4)
    // doc 10: max(1,0) + max(0,1) = 2.0; doc 20: max(-1,.6) + max(0,.8) = 1.4
    assert(got == Seq((1L, 10L, 2000000L, 1), (1L, 20L, 1400000L, 2)))
    // a zero-norm doc token (NaN cosine) must not poison the max
    val withZero = docToks.unionAll(
      Seq((10L, Seq(0.0f, 0.0f))).toDF("doc_id", "vec"))
    val again = Similarity.maxSimTopK(withZero, "doc_id", "vec",
        qToks, "q_id", "tok", "vec", k = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(_._4)
    assert(again == got)
    intercept[IllegalArgumentException](Similarity.maxSimTopK(docToks,
      "doc_id", "vec", qToks, "q_id", "tok", "vec", k = 0))
  }

  test("maxSimTopK degenerates to bruteForceTopK on single-token bags (X67)") {
    // one token per doc and per query: MaxSim == plain cosine retrieval
    val docToks = vecs.select(col("vec_id"), col("embedding").as("vec"))
    val qToks = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), lit(0).as("tok"),
        col("embedding").as("vec"))
    val ms = Similarity.maxSimTopK(docToks, "vec_id", "vec",
        qToks, "q_id", "tok", "vec", k = 4)
      .select(col("neighbor_id"), col("score_micro"), col("rank"))
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    val bf = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 4, excludeSelf = false)
      .select(col("neighbor_id"), round(col("sim") * 1e6).cast("long"),
        col("rank"))
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(ms == bf, "single-token MaxSim diverged from brute-force cosine")
  }

  test("projectionMatrix: ±1/0 entries, md5-replayable, Achlioptas density (X70)") {
    val m = Similarity.projectionMatrix(inDim = 64, outDim = 16, seed = "s")
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(e => e == 1.0 || e == -1.0 || e == 0.0))
    // density ~ (1/6, 1/6, 2/3) of 1024 entries; deterministic for seed "s"
    val zeros = m.flatten.count(_ == 0.0)
    assert(zeros > 1024 * 0.55 && zeros < 1024 * 0.78,
      s"zero density off: $zeros/1024")
    // replay one entry through Spark's INDEPENDENT md5 implementation
    val hex = spark.sql("SELECT substr(md5('rp:s:3:17'), 1, 8)")
      .as[String].head()
    val expect = java.lang.Long.parseLong(hex, 16) % 6 match {
      case 0 => 1.0; case 1 => -1.0; case _ => 0.0
    }
    assert(m(3)(17) == expect)
    // determinism + seed sensitivity
    assert(Similarity.projectionMatrix(64, 16, "s").map(_.toSeq).toSeq ==
      m.map(_.toSeq).toSeq)
    assert(Similarity.projectionMatrix(64, 16, "t").map(_.toSeq).toSeq !=
      m.map(_.toSeq).toSeq)
  }

  test("randomProject: JL distance preservation and the null contract (X70)") {
    val proj = Similarity.randomProject(col("embedding"), inDim = 3,
      outDim = 32, seed = "jl")
    // 3-dim unit-ish vectors from the spec fixture, projected UP to 32
    // dims (k > d keeps JL distortion tiny and the check deterministic)
    val rows = vecs.select(col("vec_id"), col("embedding").cast("array<double>"),
        proj.as("p"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    assert(rows.forall(_._3.length == 32))
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = for {
      (idA, vA, pA) <- rows; (idB, vB, pB) <- rows if idA < idB
      orig = d2(vA, vB) if orig > 1e-9
    } yield d2(pA, pB) / orig
    // deterministic matrix -> deterministic ratios; E[ratio] = 1
    val mean = pairs.sum / pairs.length
    assert(mean > 0.6 && mean < 1.5, s"JL mean distortion off: $mean")
    // length-mismatched vector -> null projection entries, not a wrong one
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .select(Similarity.randomProject(col("embedding"), 3, 8, "jl").as("p"))
      .head().getSeq[Any](0)
    assert(bad.forall(_ == null))
  }

  test("mmrRerank: diversity flips relevance order; exact scores; guards (X133)") {
    import spark.implicits._
    // A and B are IDENTICAL vectors (sim = 1e6 exactly), C orthogonal
    // (sim = 0): at λ = .5 the greedy picks A (rel .9), then C (rel .5
    // beats B's redundancy penalty), then B — with exact micro scores
    val cands = Seq(
      (7L, 1L, 900000L, Seq(1.0, 0.0)),
      (7L, 2L, 850000L, Seq(1.0, 0.0)),
      (7L, 3L, 500000L, Seq(0.0, 1.0)))
      .toDF("q", "cid", "rel", "v")
    val got = Similarity.mmrRerank(cands, Seq("q"), col("cid"), col("rel"),
        col("v"), k = 3, lambdaMicro = 500000L)
      .select("q", "id", "rank", "rel_micro", "score_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(got == Seq(
      (7L, 1L, 1L, 900000L, 450000L),
      (7L, 3L, 2L, 500000L, 250000L),
      (7L, 2L, 3L, 850000L, -75000L)), s"got $got")
    // λ = 1e6 degeneracy: pure relevance order, no diversity term
    val pure = Similarity.mmrRerank(cands, Seq("q"), col("cid"), col("rel"),
        col("v"), k = 3, lambdaMicro = 1000000L)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(pure == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $pure")
    // equal-score tie picks the smallest id; groups fold independently
    val tied = Seq((1L, 5L, 100L, Seq(1.0, 0.0)),
      (1L, 4L, 100L, Seq(0.0, 1.0)), (2L, 9L, 7L, Seq(1.0, 1.0)))
      .toDF("q", "cid", "rel", "v")
    val t2 = Similarity.mmrRerank(tied, Seq("q"), col("cid"), col("rel"),
        col("v"), k = 1, lambdaMicro = 1000000L)
      .select("q", "id").as[(Long, Long)].collect().toSet
    assert(t2 == Set((1L, 4L), (2L, 9L)), s"got $t2")
    // guards: zero-norm vector, per-group candidate budget, k bounds
    intercept[IllegalArgumentException](Similarity.mmrRerank(
      Seq((1L, 1L, 5L, Seq(0.0, 0.0))).toDF("q", "cid", "rel", "v"),
      Seq("q"), col("cid"), col("rel"), col("v"), 1, 500000L))
    intercept[IllegalArgumentException](Similarity.mmrRerank(cands,
      Seq("q"), col("cid"), col("rel"), col("v"), 2, 500000L,
      maxCandidates = 2))
    intercept[IllegalArgumentException](Similarity.mmrRerank(cands,
      Seq("q"), col("cid"), col("rel"), col("v"), 0, 500000L))
  }

  test("mmrGreedy: running-max cache costs O(k·n) cosine evaluations and " +
      "equals the naive full-rescan greedy (X133)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(t: String) = { val d = md.digest(t.getBytes("UTF-8")); d(0) & 0xff }
    val n = 30; val k = 10
    // signed components ⇒ pairwise cosines go NEGATIVE, exercising the
    // sentinel that keeps the running max from clamping at 0
    val cand = (1 to n).map(i => (i.toLong, h(s"r:$i").toLong * 1000L,
      Array.tabulate(8)(j => h(s"v:$i:$j").toDouble - 127.5))).toVector
    def cos(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      math.round(1e6 * (dot / (math.sqrt(nx) * math.sqrt(ny))))
    }
    var evals = 0
    val got = Similarity.mmrGreedy(cand, k, 500000L,
      (a, b) => { evals += 1; cos(a, b) })
    // each post-first round scores the remaining set against ONLY the
    // newest pick: Σ_{r=1..k−1}(n−r) = 225 here; the k²·n full rescan
    // this replaces would be Σ_{r=1..k−1} r·(n−r) = 1200
    assert(evals == (1 until k).map(n - _).sum, s"evals $evals")
    // the cached trajectory must equal the naive rescan bit for bit
    var remaining = cand
    var selected = Vector.empty[Array[Double]]
    val naive = Vector.newBuilder[(Long, Long, Long, Long)]
    (1 to k).foreach { rank =>
      val scored = remaining.map { case (cid, rel, v) =>
        val m = if (selected.isEmpty) 0L else selected.map(cos(v, _)).max
        (cid, rel, v, (500000L * rel - 500000L * m) / 1000000L)
      }
      val pick = scored.minBy { case (cid, _, _, sc) => (-sc, cid) }
      naive += ((rank.toLong, pick._1, pick._2, pick._4))
      selected = selected :+ pick._3
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    assert(got == naive.result(), s"got $got")
  }

  test("embeddingDrift: exact 2-d hand case, zero-vector drop, " +
      "one-sided family, ragged refusal, determinism (X170)") {
    // old centroid sums (1e6, 1e6); new (2e6, 0):
    // centroid cos = 1/sqrt(2); old dispersion = cos 45deg; new = 1
    val oldE = Seq(("f", 1L, Seq(1f, 0f)), ("f", 2L, Seq(0f, 1f)),
      // a zero vector carries no angle: drops from the dispersion
      // mean, still censused in n_old
      ("f", 5L, Seq(0f, 0f)),
      ("z", 9L, Seq(1f, 0f))).toDF("fam", "id", "v")
    val newE = Seq(("f", 3L, Seq(1f, 0f)), ("f", 4L, Seq(1f, 0f)))
      .toDF("fam", "id", "v")
    val got = Similarity.embeddingDrift(oldE, newE, Seq("fam"),
        col("id"), col("v")).orderBy("fam")
      .as[(String, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long])].collect().toSeq
    val cos45 = math.round(1e6 * 1e12 /
      (1e6 * math.sqrt(2e12))) // 707107
    assert(got == Seq(
      ("f", 3L, 2L, 2L, Some(707107L), Some(cos45), Some(1000000L),
        Some(1000000L - cos45)),
      ("z", 1L, 0L, 2L, None, Some(1000000L), None, None)), s"got $got")
    // ragged dimensions refuse
    val e = intercept[IllegalArgumentException](Similarity.embeddingDrift(
      Seq(("f", 1L, Seq(1f, 0f)), ("f", 2L, Seq(1f, 0f, 0f)))
        .toDF("fam", "id", "v"),
      newE, Seq("fam"), col("id"), col("v")))
    assert(e.getMessage.contains("ragged"))
    // over-dims refuse: the DECIMAL(38) norm-sum budget only holds to
    // ~1e4 dimensions (ADVICE r17 — the doc's stated bound, enforced)
    val big = Seq(("f", 1L, Seq.fill(10001)(1f))).toDF("fam", "id", "v")
    val e2 = intercept[IllegalArgumentException](Similarity.embeddingDrift(
      big, big, Seq("fam"), col("id"), col("v")))
    assert(e2.getMessage.contains("1e4"))
    // determinism under repartition
    assert(Similarity.embeddingDrift(oldE.repartition(5),
      newE.repartition(3), Seq("fam"), col("id"), col("v"))
      .orderBy("fam")
      .as[(String, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long])].collect().toSeq == got)
  }
}
