package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch-of-union equals union-of-sketches; estimates track exact counts") {
    val batch1 = (1L to 4000L).map(i => ("g" + (i % 2), i)).toDF("g", "v")
    val batch2 = (3001L to 6000L).map(i => ("g" + (i % 2), i)).toDF("g", "v")
    // per-batch sketches, merged across batches (the incremental path)
    val merged = Sketches.mergeSketches(
      Sketches.distinctSketch(batch1, Seq("g"), col("v"))
        .unionByName(Sketches.distinctSketch(batch2, Seq("g"), col("v"))),
      Seq("g"))
    val viaMerge = merged
      .select(col("g"), Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    // one-shot sketch over the unioned data (the re-scan path) — HLL merge
    // is lossless, so both paths must agree EXACTLY, not just within error
    val oneShot = Sketches.distinctSketch(
        batch1.unionByName(batch2), Seq("g"), col("v"))
      .select(col("g"), Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    assert(viaMerge == oneShot)
    // estimates within ~4σ of exact (σ ≈ 1.04/√2^12 ≈ 1.6%)
    val exact = batch1.unionByName(batch2).groupBy("g")
      .agg(countDistinct("v").as("d")).as[(String, Long)].collect().toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(viaMerge(g) - d).toDouble / d < 0.065,
        s"group $g: estimate ${viaMerge(g)} vs exact $d")
    }
  }

  test("sketch aggregation shuffles sketch-sized state, not values") {
    val df = (1L to 1000L).map(i => ("g", i)).toDF("g", "v")
    val p = Sketches.distinctSketch(df, Seq("g"), col("v"))
      .queryExecution.executedPlan.toString
    // partial + final aggregate around the exchange = map-side merge
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      s"sketch agg not partial before the shuffle:\n$p")
    intercept[IllegalArgumentException](
      Sketches.distinctSketch(df, Seq("g"), col("v"), lgK = 2))
    intercept[IllegalArgumentException](Sketches.distinctSketch(df, Nil, col("v")))
    // a group column named like the sketch output would emit duplicate names
    intercept[IllegalArgumentException](
      Sketches.distinctSketch(df.withColumnRenamed("g", "sketch"),
        Seq("sketch"), col("v")))
  }

  test("merged KLL quantile sketches track exact quantiles across batches") {
    // two disjoint batches covering 1..10000 per group; the merged sketch
    // must place every decile within the rank-error band of exact
    val batch1 = (1L to 10000L).filter(_ % 2 == 0)
      .map(i => ("g" + (i % 3), i)).toDF("g", "v")
    val batch2 = (1L to 10000L).filter(_ % 2 == 1)
      .map(i => ("g" + (i % 3), i)).toDF("g", "v")
    val merged = Sketches.mergeQuantileSketches(
      Sketches.quantileSketch(batch1, Seq("g"), col("v"))
        .unionByName(Sketches.quantileSketch(batch2, Seq("g"), col("v"))),
      Seq("g"))
    val est = merged.select(col("g"),
        Sketches.quantileEstimate(col("qsketch"), 0.5).as("p50"),
        Sketches.quantileEstimate(col("qsketch"), 0.9).as("p90"))
      .as[(String, Long, Long)].collect()
    assert(est.length == 3)
    est.foreach { case (g, p50, p90) =>
      // each group holds ~3333 values spread over 1..10000; rank error
      // ~1.65% at k=200 → ±5% of the value range is a generous bound
      assert(math.abs(p50 - 5000L) < 500, s"group $g p50=$p50")
      assert(math.abs(p90 - 9000L) < 500, s"group $g p90=$p90")
      assert(p50 < p90)
    }
    intercept[IllegalArgumentException](
      Sketches.quantileSketch(batch1, Nil, col("v")))
    intercept[IllegalArgumentException](
      Sketches.quantileSketch(batch1, Seq("g"), col("v"), k = 4))
    intercept[IllegalArgumentException](
      Sketches.quantileEstimate(col("qsketch"), 1.5))
  }

  test("KLL sketch aggregation is partial before the shuffle") {
    val df = (1L to 1000L).map(i => ("g", i)).toDF("g", "v")
    val p = Sketches.quantileSketch(df, Seq("g"), col("v"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      s"KLL sketch agg not partial before the shuffle:\n$p")
  }

  test("CMS merge is exactly linear and estimates never undercount") {
    // skewed stream: key k appears k times (1..60), split into two batches
    val rows = for (k <- 1L to 60L; _ <- 1L to k) yield k
    val (b1, b2) = rows.splitAt(rows.length / 3)
    val sk1 = Sketches.freqSketch(b1.toDF("k"), col("k"), depth = 3, width = 64, seed = "t")
    val sk2 = Sketches.freqSketch(b2.toDF("k"), col("k"), depth = 3, width = 64, seed = "t")
    val merged = Sketches.mergeFreqSketches(sk1.unionByName(sk2))
    // CMS is linear: merged counters must EQUAL the one-shot sketch's
    val oneShot = Sketches.freqSketch(rows.toDF("k"), col("k"),
      depth = 3, width = 64, seed = "t")
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
    // estimate(k) >= true(k) for every key, and ties out exactly when the
    // min-depth row is collision-free
    val est = Sketches.freqEstimate(merged, rows.toDF("k"), "k",
        depth = 3, width = 64, seed = "t")
      .as[(Long, Long)].collect().toMap
    (1L to 60L).foreach(k => assert(est(k) >= k, s"undercount: est(${k})=${est(k)}"))
    // a probe key never inserted estimates >= 0 and rides only collisions
    val cold = Sketches.freqEstimate(merged, Seq(999L).toDF("k"), "k",
        depth = 3, width = 64, seed = "t")
      .as[(Long, Long)].collect()
    assert(cold.length == 1 && cold.head._2 >= 0L)
  }

  test("CMS drops null keys, bounds output, and guards its parameters") {
    val df = Seq(Some(1L), None, Some(1L), Some(2L)).toDF("k")
    val sk = Sketches.freqSketch(df, col("k"), depth = 2, width = 8, seed = "t")
    // 3 non-null inserts; counters sum to depth × 3, nulls contribute nothing
    assert(sk.agg(sum("cnt")).as[Long].head() == 6L)
    assert(sk.count() <= 2 * 8)
    intercept[IllegalArgumentException](
      Sketches.freqSketch(df, col("k"), depth = 0))
    intercept[IllegalArgumentException](
      Sketches.freqSketch(df, col("k"), width = 1))
    intercept[IllegalArgumentException](
      Sketches.freqEstimate(sk, df, "nope"))
  }

  test("CMS build is partial-aggregated; estimate broadcasts the sketch") {
    val df = (1L to 1000L).map(i => i % 7).toDF("k")
    val sk = Sketches.freqSketch(df, col("k"), depth = 3, width = 32, seed = "t")
    val build = sk.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(build).size >= 2,
      s"CMS build not partial before the shuffle:\n$build")
    val est = Sketches.freqEstimate(sk, df, "k", depth = 3, width = 32, seed = "t")
      .queryExecution.executedPlan.toString
    assert(est.contains("BroadcastHashJoin"),
      s"CMS estimate does not broadcast the sketch:\n$est")
  }

  test("kmvSketch: distinct, capped at k, and eviction agrees with a big-k run") {
    val df = (1L to 200L).flatMap(i => Seq(("a", s"key$i"), ("a", s"key$i")))
      .toDF("g", "k") // every key twice: distinctness is load-bearing
    val small = Sketches.kmvSketch(df, col("g"), col("k"), k = 8, seed = "t")
      .orderBy("hv").as[(String, Long)].collect().toSeq
    // the never-evicting path must agree with the evicting one on the 8 min
    val big = Sketches.kmvSketch(df, col("g"), col("k"), k = 200, seed = "t")
      .orderBy("hv").as[(String, Long)].collect().toSeq
    assert(small.size == 8)
    assert(big.size == 200)
    assert(small == big.take(8))
  }

  test("kmv merge of batch sketches equals the sketch of the concatenation") {
    val b1 = (1L to 500L).map(i => ("s", s"k$i")).toDF("g", "k")
    val b2 = (400L to 900L).map(i => ("s", s"k$i")).toDF("g", "k")
    val whole = Sketches.kmvSketch(b1.unionByName(b2), col("g"), col("k"), k = 32)
      .orderBy("hv").as[(String, Long)].collect().toSeq
    val merged = Sketches.kmvMergeSketches(
        Sketches.kmvSketch(b1, col("g"), col("k"), k = 32)
          .unionByName(Sketches.kmvSketch(b2, col("g"), col("k"), k = 32)),
        k = 32)
      .orderBy("hv").as[(String, Long)].collect().toSeq
    assert(whole.size == 32 && merged == whole)
  }

  test("kmvJaccard is EXACT below the cap; 1.0 identical; 0.0 disjoint") {
    val df = ((1 to 10).map(i => ("A", s"x$i")) ++
      (6 to 15).map(i => ("B", s"x$i")) ++        // |A∩B|=5, |A∪B|=15
      (1 to 10).map(i => ("C", s"x$i")) ++        // C = A
      (1 to 10).map(i => ("D", s"y$i")))          // D disjoint from all
      .toDF("g", "k")
    val sk = Sketches.kmvSketch(df, col("g"), col("k"), k = 64)
    val est = Sketches.kmvJaccard(sk, k = 64)
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(est(("A", "B")) == math.rint(5.0 / 15.0 * 1e6) / 1e6)
    assert(est(("A", "C")) == 1.0)
    assert(est(("A", "D")) == 0.0 && est(("B", "D")) == 0.0)
    assert(est.size == 6)
  }

  test("kmvJaccard minSharedHashes: pair set pruned, surviving estimates unchanged") {
    // same geometry as above: D is disjoint, so 3 of the 6 pairs share no
    // sketch value and must vanish; the overlapping pairs keep their exact
    // estimates. This is the pair-explosion guard: candidates come from a
    // hash-keyed self-join, so at thousands of groups the pair frame is
    // collision-sized, not P(P-1)/2.
    val df = ((1 to 10).map(i => ("A", s"x$i")) ++
      (6 to 15).map(i => ("B", s"x$i")) ++
      (1 to 10).map(i => ("C", s"x$i")) ++
      (1 to 10).map(i => ("D", s"y$i")))
      .toDF("g", "k")
    val sk = Sketches.kmvSketch(df, col("g"), col("k"), k = 64).persist()
    try {
      val full = Sketches.kmvJaccard(sk, k = 64)
        .as[(String, String, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val pruned = Sketches.kmvJaccard(sk, k = 64, minSharedHashes = 1)
        .as[(String, String, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      // exactly the zero-estimate pairs disappear; the rest are unchanged
      assert(pruned == full.filter(_._2 > 0.0))
      assert(pruned.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
      // a higher floor prunes low-evidence pairs too (A∩B shares 5 of 64)
      val strict = Sketches.kmvJaccard(sk, k = 64, minSharedHashes = 6)
        .as[(String, String, Double)].collect()
      assert(strict.map(r => (r._1, r._2)).toSet == Set(("A", "C")))
    } finally sk.unpersist()
  }

  private def bloomReplica(keys: Seq[String], bits: Int, hashes: Int,
      seed: String): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (for { k <- keys; i <- 0 until hashes } yield {
      val hex = md.digest(s"$seed:$i:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % bits
    }).toSet
  }

  test("bloom: zero false negatives; positions match an independent replica (X89)") {
    val members = (1 to 40).map(i => s"doc$i")
    val sk = Sketches.bloomSketch(members.toDF("k"), col("k"),
      bits = 4096, hashes = 5, seed = "b1")
    val positions = sk.as[Long].collect().toSet
    assert(positions == bloomReplica(members, 4096, 5, "b1"),
      "set bits diverge from the MessageDigest replica")
    // every member probes true — structural, not probabilistic
    val probed = Sketches.bloomProbe(sk, members.toDF("k"), "k",
        bits = 4096, hashes = 5, seed = "b1")
      .as[(String, Boolean)].collect()
    assert(probed.length == 40 && probed.forall(_._2), s"false negative!")
  }

  test("bloom: merge ≡ build-over-union; false positives at tiny widths; NULLs") {
    val a = Sketches.bloomSketch((1 to 30).map(i => s"a$i").toDF("k"),
      col("k"), bits = 256, hashes = 3, seed = "b2")
    val b = Sketches.bloomSketch((1 to 30).map(i => s"b$i").toDF("k"),
      col("k"), bits = 256, hashes = 3, seed = "b2")
    val merged = Sketches.bloomMerge(a.unionAll(b))
    val direct = Sketches.bloomSketch(
      ((1 to 30).map(i => s"a$i") ++ (1 to 30).map(i => s"b$i")).toDF("k"),
      col("k"), bits = 256, hashes = 3, seed = "b2")
    assert(merged.as[Long].collect().toSet == direct.as[Long].collect().toSet)
    // 60 keys × 3 hashes into 256 bits: ~half the bits set — outsiders
    // must hit SOME false positives (and deterministically the same ones)
    val outsiders = (1 to 200).map(i => s"z$i").toDF("k")
    val fp1 = Sketches.bloomProbe(merged, outsiders, "k", 256, 3, "b2")
      .filter(col("member")).as[(String, Boolean)].collect().map(_._1).toSet
    assert(fp1.nonEmpty, "tiny filter produced no false positives?")
    val fp2 = Sketches.bloomProbe(merged, outsiders.repartition(7), "k",
        256, 3, "b2")
      .filter(col("member")).as[(String, Boolean)].collect().map(_._1).toSet
    assert(fp1 == fp2, "false-positive set not deterministic")
    // NULL keys drop on both sides
    assert(Sketches.bloomSketch(Seq(Option.empty[String]).toDF("k"),
      col("k"), 256, 3, "b2").count() == 0)
    intercept[IllegalArgumentException](
      Sketches.bloomSketch(a, col("pos"), bits = 1))
    intercept[IllegalArgumentException](
      Sketches.bloomSketch(a, col("pos"), hashes = 0))
  }
}
