package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 round-trip error is bounded by scale/2; zero and null vectors safe") {
    val df = Seq(
      (1L, Some(Seq(0.5f, -1.0f, 0.25f, 0.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),          // zero vector
      (3L, None: Option[Seq[Float]])        // null vector
    ).toDF("id", "v")
    val q = Quantize.quantizeInt8(df, "v")
    val rows = q.withColumn("dq", Quantize.dequantizeInt8(col("qvec"), col("scale")))
      .withColumn("max_err",
        aggregate(zip_with(col("v"), col("dq"), (a, b) => abs(a.cast("double") - b)),
          lit(0.0), (acc, e) => greatest(acc, e)))
      .orderBy("id").collect()

    val r1 = rows(0)
    assert(r1.getDouble(r1.fieldIndex("scale")) == 1.0 / 127.0)
    assert(r1.getDouble(r1.fieldIndex("max_err")) <= 1.0 / 127.0 / 2 + 1e-12)
    // the extreme component is exactly representable: q = ±127
    assert(r1.getSeq[Byte](r1.fieldIndex("qvec"))(1) == -127)

    val r2 = rows(1)
    assert(r2.getDouble(r2.fieldIndex("scale")) == 0.0)
    assert(r2.getSeq[Byte](r2.fieldIndex("qvec")).forall(_ == 0))
    assert(r2.getDouble(r2.fieldIndex("max_err")) == 0.0)

    val r3 = rows(2)
    assert(r3.isNullAt(r3.fieldIndex("scale")) && r3.isNullAt(r3.fieldIndex("qvec")))
  }

  test("NaN and Inf elements yield null qvec instead of a task kill or zeros") {
    val df = Seq(
      (1L, Seq(Float.NaN, 1.0f)),
      (2L, Seq(Float.PositiveInfinity, 1.0f)),
      (3L, Seq(0.5f, -0.5f))
    ).toDF("id", "v")
    val rows = Quantize.quantizeInt8(df, "v").orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("qvec")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("qvec")))
    assert(!rows(2).isNullAt(rows(2).fieldIndex("qvec")))
  }

  test("quantization is map-only and reserved-name safe") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val plan = Quantize.quantizeInt8(df, "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantize shuffled:\n$plan")
    intercept[IllegalArgumentException](
      Quantize.quantizeInt8(df.withColumn("qvec", lit(1)), "v"))
  }

  test("ANN over dequantized vectors matches exact top-1 on separated data") {
    def unit(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val emb = Seq((1L, unit(0)), (2L, unit(10)), (3L, unit(90)), (4L, unit(95)))
      .toDF("vec_id", "embedding")
    val dq = Quantize.quantizeInt8(emb, "embedding")
      .select(col("vec_id"),
        Quantize.dequantizeInt8(col("qvec"), col("scale")).as("embedding"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid", "qv", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val approx = Similarity.bruteForceTopK(dq, "vec_id", "embedding",
      dq.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid", "qv", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(approx == exact) // int8 noise ≪ the 10° angular separation
  }

  test("binarySign packs MSB-first; hamming counts sign disagreements") {
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.0f, -0.5f)),   // bits 1,0,1,0 -> 0b1010 = 10
      (2L, Seq(1.0f, 1.0f, 0.0f, -0.5f)),    // bits 1,1,1,0 -> 0b1110 = 14
      (3L, Seq(-1.0f, -1.0f, -1.0f, -0.5f))  // bits 0,0,0,0 -> 0
    ).toDF("id", "v")
    val coded = df.select(col("id"), Quantize.binarySign(col("v"), 4).as("c"))
    val codes = coded.as[(Long, Seq[Long])].collect().toMap
    assert(codes == Map(1L -> Seq(10L), 2L -> Seq(14L), 3L -> Seq(0L)))
    // NaN packs as 1 (Spark SQL orders NaN larger than every number, so
    // NaN >= 0 is TRUE — DuckDB agrees); it never nulls the code
    val nan = Seq((9L, Seq(Float.NaN, -1.0f))).toDF("id", "v")
      .select(Quantize.binarySign(col("v"), 2).as("c")).as[Seq[Long]].head()
    assert(nan == Seq(2L))
    // hamming: 1010 xor 1110 = 0100 -> 1; 1010 xor 0000 -> 2
    val q = coded.filter(col("id") === 1).select(col("c").as("qc"))
    val d = Quantize.hammingTopK(coded, "id", "c", q, "qc", k = 3)
      .as[(Long, Int)].collect().toSeq
    assert(d == Seq((1L, 0), (2L, 1), (3L, 2)))
  }

  test("binarySign spans words for dim > 64 and stays map-only") {
    // 65 dims: all positive -> word0 = -1 (64 ones), word1 = 1 (one bit)
    val df = Seq((1L, Seq.fill(65)(1.0f))).toDF("id", "v")
    val c = df.select(Quantize.binarySign(col("v"), 65).as("c"))
      .as[Seq[Long]].head()
    assert(c == Seq(-1L, 1L))
    val plan = df.select(Quantize.binarySign(col("v"), 65).as("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"binarySign shuffled:\n$plan")
  }

  test("wrong-length vectors null their code and sort LAST in top-k") {
    // a 3-element vector in a dim=4 corpus would pack misaligned bits —
    // silently wrong distances; it must null out and never displace a
    // real neighbor (Spark's nulls-first ASC default would rank it #1)
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 1.0f, -1.0f)),
      (2L, Seq(1.0f, -1.0f, 1.0f)), // short
      (3L, Seq(1.0f, 1.0f, 1.0f, -1.0f))
    ).toDF("id", "v")
    val coded = df.select(col("id"), Quantize.binarySign(col("v"), 4).as("c"))
    assert(coded.filter(col("id") === 2).select(col("c")).first().isNullAt(0))
    val q = coded.filter(col("id") === 1).select(col("c").as("qc"))
    val top = Quantize.hammingTopK(coded, "id", "c", q, "qc", k = 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L)) // the null-code row is NOT in the top-k
  }

  test("hamming candidates agree with exact cosine top-1 on separated data") {
    // antipodal-ish sign structure: the nearest exact-cosine neighbor is
    // also the nearest Hamming neighbor when signs separate cleanly
    val a = Seq.fill(8)(1.0f)
    val b = Seq.fill(7)(1.0f) :+ -1.0f        // 1 sign flip from a
    val c = Seq.fill(8)(-1.0f)                 // 8 flips from a
    val emb = Seq((0L, a), (1L, b), (2L, c)).toDF("vec_id", "embedding")
    val coded = emb.select(col("vec_id"),
      Quantize.binarySign(col("embedding"), 8).as("code"))
    val q = coded.filter(col("vec_id") === 0).select(col("code").as("qc"))
    val top = Quantize.hammingTopK(coded, "vec_id", "code", q, "qc", k = 2)
      .as[(Long, Int)].collect().toSeq
    assert(top == Seq((0L, 0), (1L, 1)))
  }

  test("binary candidates + exact re-rank recover the exact top-10 (fixture)") {
    // the documented two-stage retrieval: Hamming-50 candidate generation
    // over 1-bit codes, exact-cosine re-rank of the survivors. On the
    // sf0.001 embeddings (deterministic fixture) the re-ranked top-10
    // recovers 8/10 of the exact top-10 — the recall a 64-bit sign code
    // buys at 10x candidate over-fetch, pinned so a packing regression
    // (bit order, NaN handling, truncation) shows up as a recall drop.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coded = emb.select(col("vec_id"),
      Quantize.binarySign(col("embedding"), 64).as("code"))
    val qc = coded.filter(col("vec_id") === 0).select(col("code").as("qcode"))
    val cand = Quantize.hammingTopK(coded, "vec_id", "code", qc, "qcode", k = 50)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        qv, "qid", "qv", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    val rerank = Similarity.bruteForceTopK(
        emb.join(cand.select("vec_id"), "vec_id"), "vec_id", "embedding",
        qv, "qid", "qv", k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert((exact & rerank).size >= 8, s"recall collapsed: $exact vs $rerank")
  }

  test("pqEncode picks the nearest centroid, ties to the lowest index") {
    // subspace 0 centroids: (0,0) and (1,1); subspace 1: (2,2) and (0,0)
    val cb = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
      Seq(Seq(2.0, 2.0), Seq(0.0, 0.0)))
    val vecs = Seq(
      (1L, Seq(0.1, 0.1, 1.9, 2.1)), // → (0, 0)
      (2L, Seq(0.9, 1.1, 0.2, 0.0)), // → (1, 1)
      (3L, Seq(0.5, 0.5, 1.0, 1.0)), // equidistant BOTH subspaces → (0, 0)
      (4L, Seq(1.0, 1.0, 1.0))       // wrong length → null code
    ).toDF("id", "v")
    val out = Quantize.pqEncode(vecs, col("v"), cb)
      .select(col("id"), col("pq_code")).as[(Long, Option[Seq[Int]])]
      .collect().toMap
    assert(out(1L).contains(Seq(0, 0)))
    assert(out(2L).contains(Seq(1, 1)))
    assert(out(3L).contains(Seq(0, 0)), s"tie not broken low: ${out(3L)}")
    assert(out(4L).isEmpty)
    intercept[IllegalArgumentException](Quantize.pqEncode(vecs, col("v"), Nil))
    intercept[IllegalArgumentException](
      Quantize.pqEncode(vecs, col("v"), Seq(Seq(Seq(1.0), Seq(1.0, 2.0)))))
    intercept[IllegalArgumentException](
      Quantize.pqEncode(vecs.withColumnRenamed("v", "pq_code"), col("pq_code"), cb))
  }

  test("PQ ADC at the lossless point equals exact squared-L2 order; nulls last") {
    // codebooks = exactly the distinct subvectors present → encoding is
    // lossless → ADC distance IS the exact distance → top-k order must
    // match brute force
    val subs = Seq(Seq(0.0, 1.0), Seq(2.0, 0.5), Seq(-1.0, 3.0), Seq(0.25, -2.0))
    val vecs = (for {
      a <- subs.indices; b <- subs.indices
    } yield ((a * subs.size + b).toLong, subs(a) ++ subs(b))).toDF("id", "v")
    val cb = Seq(subs, subs)
    val enc = Quantize.pqEncode(vecs, col("v"), cb)
    val q = Seq(Tuple1(Seq(0.1, 0.9, 1.8, 0.6))).toDF("qv")
    val adc = Quantize.pqAdcTopK(enc.select(col("id"), col("pq_code")),
        "id", "pq_code", q, "qv", cb, k = 16)
      .as[(Long, Double)].collect()
    val exact = vecs.crossJoin(q)
      .select(col("id"),
        round(aggregate(zip_with(col("v"), col("qv"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, e) => a + e), 6).as("d"))
      .orderBy(col("d"), col("id")).as[(Long, Double)].collect()
    assert(adc.map(_._1).toSeq == exact.map(_._1).toSeq,
      s"ADC order diverged:\n$adc\nvs\n$exact")
    adc.zip(exact).foreach { case ((_, da), (_, de)) =>
      assert(math.abs(da - de) < 1e-6, s"lossless ADC distance drifted: $da vs $de")
    }
    // a wrong-length vector's null code sorts last, never displacing a real row
    val withBad = vecs.union(Seq((99L, Seq(1.0))).toDF("id", "v"))
    val encBad = Quantize.pqEncode(withBad, col("v"), cb)
    val top = Quantize.pqAdcTopK(encBad.select(col("id"), col("pq_code")),
        "id", "pq_code", q, "qv", cb, k = 17)
      .as[(Long, Option[Double])].collect()
    assert(top.last._1 == 99L && top.last._2.isEmpty)
    assert(top.init.forall(_._2.nonEmpty))
  }

  test("pqAdcTopKLiteral == pqAdcTopK bit-for-bit, with no HOF in the plan") {
    val subs = Seq(Seq(0.0, 1.0), Seq(2.0, 0.5), Seq(-1.0, 3.0), Seq(0.25, -2.0))
    val vecs = (for {
      a <- subs.indices; b <- subs.indices
    } yield ((a * subs.size + b).toLong, subs(a) ++ subs(b))).toDF("id", "v")
    val cb = Seq(subs, subs)
    val enc = Quantize.pqEncode(vecs, col("v"), cb)
      .select(col("id"), col("pq_code"))
    val qv = Seq(0.1, 0.9, 1.8, 0.6)
    val viaColumn = Quantize.pqAdcTopK(enc, "id", "pq_code",
        Seq(Tuple1(qv)).toDF("qv"), "qv", cb, k = 16)
      .as[(Long, Double)].collect().toSeq
    val lit16 = Quantize.pqAdcTopKLiteral(enc, "id", "pq_code", qv, cb, k = 16)
    assert(lit16.as[(Long, Double)].collect().toSeq == viaColumn,
      "literal-query ADC diverged from the column-query form")
    // the deployment claim: per-row work is literal-array lookups — the
    // per-row dot-product HOFs of the column form must be GONE
    val plan = lit16.queryExecution.executedPlan.toString
    assert(!plan.contains("aggregate(") && !plan.contains("zip_with"),
      s"literal ADC still carries HOF arithmetic:\n$plan")
    // null codes still sort last
    val withBad = enc.union(Seq((99L, Option.empty[Seq[Int]])).toDF("id", "pq_code"))
    val top = Quantize.pqAdcTopKLiteral(withBad, "id", "pq_code", qv, cb, k = 17)
      .as[(Long, Option[Double])].collect()
    assert(top.last._1 == 99L && top.last._2.isEmpty)
    // dim mismatch refused
    intercept[IllegalArgumentException](
      Quantize.pqAdcTopKLiteral(enc, "id", "pq_code", Seq(1.0), cb, k = 1))
  }

  test("pqAdcTables + pqAdcDistFromTables == pqAdcTopK bit-for-bit (batched face)") {
    val subs = Seq(Seq(0.0, 1.0), Seq(2.0, 0.5), Seq(-1.0, 3.0), Seq(0.25, -2.0))
    val vecs = (for {
      a <- subs.indices; b <- subs.indices
    } yield ((a * subs.size + b).toLong, subs(a) ++ subs(b))).toDF("id", "v")
    val cb = Seq(subs, subs)
    val enc = Quantize.pqEncode(vecs, col("v"), cb)
      .select(col("id"), col("pq_code"))
    // several probes at once: each probe row builds its tables ONCE, every
    // candidate row pays m lookups — and every distance must equal the
    // column form's to the last bit
    val probes = Seq((100L, Seq(0.1, 0.9, 1.8, 0.6)),
      (101L, Seq(2.0, 0.4, -0.9, 2.9))).toDF("pid", "qv")
    val viaTables = probes
      .select(col("pid"), Quantize.pqAdcTables(col("qv"), cb).as("t"))
      .crossJoin(enc)
      .select(col("pid"), col("id"),
        Quantize.pqAdcDistFromTables(col("t"), col("pq_code"), cb).as("dist"))
      .orderBy("pid", "id")
      .as[(Long, Long, Double)].collect().toSeq
    val viaColumn = probes.as[(Long, Seq[Double])].collect().toSeq.flatMap {
      case (pid, qv) =>
        Quantize.pqAdcTopK(enc, "id", "pq_code",
            Seq(Tuple1(qv)).toDF("qv"), "qv", cb, k = 16)
          .as[(Long, Double)].collect().toSeq.map { case (i, d) => (pid, i, d) }
    }.sortBy(t => (t._1, t._2))
    assert(viaTables == viaColumn,
      "table-form ADC diverged from the column-query form")
    // a null code yields a null distance, never a crash or a zero
    val badDist = probes.limit(1)
      .select(Quantize.pqAdcTables(col("qv"), cb).as("t"))
      .crossJoin(Seq(Tuple1(Option.empty[Seq[Int]])).toDF("pq_code"))
      .select(Quantize.pqAdcDistFromTables(col("t"), col("pq_code"), cb))
      .collect().head
    assert(badDist.isNullAt(0))
  }

  test("pqTrain recovers planted subspace clusters and is repartition-stable") {
    // 2 subspaces × 3 planted clusters each, small deterministic jitter —
    // Lloyd's from hash seeds must converge onto the planted centers
    val centersA = Seq(Seq(0.0, 0.0), Seq(5.0, 5.0), Seq(-5.0, 5.0))
    val centersB = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(-10.0, -10.0))
    val rows = (0 until 90).map { i =>
      val j = (i % 100) / 1000.0 - 0.045
      (i.toLong,
        centersA(i % 3).map(_ + j) ++ centersB((i / 3) % 3).map(_ - j))
    }.toDF("id", "v")
    val data = rows.select("v").as[Seq[Double]].collect()
    // total quantization error of a codebook set, computed independently
    // of the operator under test
    def err(cb: Seq[Seq[Seq[Double]]]): Double =
      data.map { v =>
        cb.zipWithIndex.map { case (cents, s) =>
          val sub = v.slice(s * 2, s * 2 + 2)
          cents.map(c => sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    val seeds = Quantize.pqTrain(rows, col("v"), dim = 4, m = 2, k = 3,
      iterations = 0)
    val trained = Quantize.pqTrain(rows, col("v"), dim = 4, m = 2, k = 3,
      iterations = 8)
    // Lloyd's objective is monotone non-increasing, and on jittered
    // clusters seeded from raw points it improves decisively (whether or
    // not it finds the global optimum)
    assert(err(trained) <= err(seeds) + 1e-6,
      s"training increased error: ${err(seeds)} -> ${err(trained)}")
    assert(err(trained) < 0.5 * err(seeds),
      s"training barely moved: ${err(seeds)} -> ${err(trained)}")
    // at least one trained centroid sits on a planted center (clusters of
    // jitter radius < 0.05 pull any solo centroid onto their mean)
    val all = trained(0) ++ trained(1)
    val planted = centersA ++ centersB
    assert(planted.exists(p => all.exists(c =>
      math.sqrt(p.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum) < 0.2)))
    // determinism: identical codebooks from a differently-partitioned input
    val again = Quantize.pqTrain(rows.repartition(13), col("v"), dim = 4,
      m = 2, k = 3, iterations = 8)
    assert(again == trained, "training diverged under repartitioning")
    // seeds (iterations = 0) have the right shape: m × k × subDim
    assert(seeds.length == 2 && seeds.forall(_.length == 3)
      && seeds.forall(_.forall(_.length == 2)))
    intercept[IllegalArgumentException](
      Quantize.pqTrain(rows, col("v"), dim = 4, m = 3, k = 3, iterations = 1))
    intercept[IllegalArgumentException](
      Quantize.pqTrain(rows, col("v"), dim = 4, m = 2, k = 0, iterations = 1))
    intercept[IllegalArgumentException](
      Quantize.pqTrain(rows.filter(lit(false)), col("v"), dim = 4, m = 2,
        k = 3, iterations = 1))
  }

  test("native dot_product == HOF fold bit-for-bit; null semantics identical") {
    // The HOF form DotProduct replaced — kept here as the reference
    // semantics the expression must reproduce exactly.
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

    // deterministic pseudo-random doubles with enough spread that any
    // ordering/precision deviation flips low-order bits
    def vec(seed: Int, n: Int): Seq[Double] =
      (0 until n).map(i => math.sin(seed * 7919.0 + i * 104729.0) * math.pow(10, i % 7 - 3))

    val rows = (0 until 64).map(i => (i.toLong, vec(i, 16), vec(i + 1000, 16)))
      .toDF("id", "a", "b")
    val both = rows.select(col("id"),
        Quantize.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (id, n, h) =>
      assert(java.lang.Double.doubleToRawLongBits(n)
          == java.lang.Double.doubleToRawLongBits(h),
        s"row $id: native $n != hof $h (bit-level)")
    }

    // float inputs promote per element, same as the HOF's implicit cast
    val fRows = Seq((1L, Seq(0.1f, -2.5f, 3.25f), Seq(1.5f, 0.5f, -0.125f)))
      .toDF("id", "af", "bf")
    val f = fRows.select(
        Quantize.dot(col("af"), col("bf")).as("native"),
        hofDot(col("af").cast("array<double>"), col("bf").cast("array<double>")).as("hof"))
      .as[(Double, Double)].head()
    assert(f._1 == f._2)

    // null semantics: null array, length mismatch, null element → null
    val edge = Seq(
      (1L, Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]),
      (2L, Option(Seq(1.0, 2.0)), Option(Seq(1.0))),
      (3L, Option(Seq(1.0, 2.0)), Option(Seq(1.0, 2.0)))
    ).toDF("id", "a", "b")
      .withColumn("b", when(col("id") === 3, array(lit(1.0), lit(null).cast("double")))
        .otherwise(col("b")))
    val e = edge.select(col("id"), Quantize.dot(col("a"), col("b")).as("d"))
      .orderBy("id").as[(Long, Option[Double])].collect()
    assert(e.forall(_._2.isEmpty), s"edge rows must all be null: ${e.mkString(",")}")

    // interpreted eval path (codegen fallback) agrees with codegen
    val cm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = rows.select(col("id"), Quantize.dot(col("a"), col("b")).as("d"))
        .as[(Long, Double)].collect().toMap
      both.foreach { case (id, n, _) => assert(interp(id) == n) }
    } finally {
      cm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }

    // the deployment claim: no HOF lambda left in the plan, and the
    // projection stays inside one whole-stage codegen span (a range
    // source, so ConvertToLocalRelation can't fold the project away)
    val plan = spark.range(8)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(Quantize.dot(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      s"dot still lowers to HOFs:\n$plan")
    assert(plan.contains("*(1) Project"), s"dot fell out of codegen:\n$plan")

    // non-array input refused eagerly
    intercept[org.apache.spark.sql.AnalysisException](
      rows.select(Quantize.dot(col("id"), col("a"))).collect())
  }
}
