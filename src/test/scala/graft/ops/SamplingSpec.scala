package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for deterministic sampling/splitting/mixing (§2.9). */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val ids = spark.range(0, 2000).toDF("id")

  test("hexThreshold maps rates to 8-hex cutoffs") {
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(0.8) == "cccccccc")
    intercept[IllegalArgumentException](Sampling.hexThreshold(0.0))
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.0))
  }

  test("sampleByHash is deterministic, seed-sensitive, and near the rate") {
    val a = Sampling.sampleByHash(ids, col("id"), 0.3, "s").as[Long].collect().toSet
    val b = Sampling.sampleByHash(ids, col("id"), 0.3, "s").as[Long].collect().toSet
    assert(a == b, "same seed+rate must reselect the identical rows")
    // binomial(2000, 0.3): ±5σ ≈ ±102
    assert(math.abs(a.size - 600) < 110, s"rate drift: ${a.size}/2000 at 0.3")
    val c = Sampling.sampleByHash(ids, col("id"), 0.3, "t").as[Long].collect().toSet
    assert(c != a, "a different seed must draw a different sample")
    // rate 0 / 1 constant-fold
    assert(Sampling.sampleByHash(ids, col("id"), 0.0).count() == 0)
    assert(Sampling.sampleByHash(ids, col("id"), 1.0).count() == 2000)
  }

  test("sampleByHash at a lower rate is a subset of a higher rate (same seed)") {
    // thresholds are nested: rate r1 < r2 keeps keep(r1) ⊆ keep(r2) — what
    // lets a pipeline downsample further without reshuffling the corpus
    val lo = Sampling.sampleByHash(ids, col("id"), 0.1, "s").as[Long].collect().toSet
    val hi = Sampling.sampleByHash(ids, col("id"), 0.4, "s").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("assignSplit is total, deterministic, and respects weights") {
    val out = Sampling.assignSplit(ids, col("id"),
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0), "s61")
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000, "every row must be assigned")
    assert(counts.keySet == Set("train", "val", "test"))
    // 80/10/10 of 2000 → 1600/200/200, ±5σ ≈ ±90/67/67
    assert(math.abs(counts("train") - 1600) < 95, counts.toString)
    assert(math.abs(counts("val") - 200) < 70, counts.toString)
    // weights normalize: 8/1/1 above ≡ 0.8/0.1/0.1
    val norm = Sampling.assignSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s61")
    assert(norm.except(out).isEmpty && out.except(norm).isEmpty)
  }

  test("assignSplit handles zero-weight and full-weight splits") {
    val z = Sampling.assignSplit(ids, col("id"),
      Seq("none" -> 0.0, "all" -> 1.0), "s")
    assert(z.filter(col("split") === "none").count() == 0)
    assert(z.filter(col("split") === "all").count() == 2000)
    intercept[IllegalArgumentException](
      Sampling.assignSplit(ids, col("id"), Seq("a" -> 0.0, "b" -> 0.0)))
  }

  test("mixBySource applies per-source rates with a default") {
    val df = ids.withColumn("src",
      when(col("id") % 3 === 0, "keep_all")
        .when(col("id") % 3 === 1, "half").otherwise("unlisted"))
    val out = Sampling.mixBySource(df, col("src"), col("id"),
      Map("keep_all" -> 1.0, "half" -> 0.5), defaultRate = 0.0, seed = "m")
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("keep_all") == 667, "rate-1.0 source must keep every row")
    assert(!counts.contains("unlisted"), "defaultRate=0 must drop unlisted sources")
    assert(math.abs(counts("half") - 333) < 85, counts.toString) // ±5σ
  }

  test("sampleKPerGroup returns min(k, group size) rows per group, deterministically") {
    val df = ids.withColumn("g", col("id") % 7)
    val out = Sampling.sampleKPerGroup(df, Seq("g"), col("id"), k = 3, seed = "s")
    val sizes = out.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == 7 && sizes.values.forall(_ == 3))
    val again = Sampling.sampleKPerGroup(df, Seq("g"), col("id"), k = 3, seed = "s")
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // a group smaller than k survives whole
    val tiny = Seq((1L, "a"), (2L, "a")).toDF("id", "g")
    assert(Sampling.sampleKPerGroup(tiny, Seq("g"), col("id"), 5).count() == 2)
  }

  test("weightedSampleK returns k rows, deterministically, and favors heavy weights") {
    val df = ids.withColumn("w", when(col("id") < 100, 50.0).otherwise(1.0))
    val out = Sampling.weightedSampleK(df, col("id"), col("w"), k = 200, seed = "s")
    assert(out.count() == 200)
    val again = Sampling.weightedSampleK(df.repartition(13), col("id"), col("w"),
      k = 200, seed = "s")
    assert(out.except(again).isEmpty && again.except(out).isEmpty,
      "the sample must be a pure function of (seed, keys, weights)")
    // 100 rows carry weight 50 vs 1900 at weight 1: expected heavy inclusion
    // P ≈ 1 - exp small... empirically heavies dominate; require a strong
    // majority of the heavy block in the sample (p(fail) negligible)
    val heavies = out.filter(col("id") < 100).count()
    assert(heavies > 80, s"only $heavies/100 heavy rows sampled at 50:1 odds")
    // weight-1-only sample of the same size is near-uniform: heavy block
    // (5% of rows) should land near 10 of 200 under uniform odds
    val unif = Sampling.weightedSampleK(df, col("id"), lit(1.0), 200, "s")
    assert(unif.filter(col("id") < 100).count() < 30)
  }

  test("weightedSampleK drops null/non-positive weights and caps at table size") {
    val df = ids.withColumn("w",
      when(col("id") % 2 === 0, -1.0).when(col("id") % 5 === 0, lit(null))
        .otherwise(2.0))
    val out = Sampling.weightedSampleK(df, col("id"), col("w"), k = 5000, seed = "s")
    // only odd non-multiple-of-5 ids have positive weight: 2000·(1/2)·(4/5)
    assert(out.count() == 800)
    assert(out.filter(col("w") <= 0 || col("w").isNull).count() == 0)
    intercept[IllegalArgumentException](
      Sampling.weightedSampleK(ids, col("id"), lit(1.0), 0))
  }

  test("rebalanceByTemperature keeps the smallest group whole and flattens the rest") {
    // three groups: 1000 / 600 / 400 rows
    val df = ids.withColumn("g",
      when(col("id") < 1000, "big").when(col("id") < 1600, "mid").otherwise("small"))
    val out = Sampling.rebalanceByTemperature(df, col("g"), col("id"),
      alpha = 0.5, seed = "s")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("small") == 400, "the smallest group must be kept in full")
    // expected keeps: n·(n/n_min)^(α−1) = sqrt(n·n_min): big → sqrt(400000)
    // ≈ 632, mid → sqrt(240000) ≈ 490; allow ±5σ binomial noise
    assert(math.abs(counts("big") - 632) < 110, counts.toString)
    assert(math.abs(counts("mid") - 490) < 85, counts.toString)
    // deterministic under repartitioning
    val again = Sampling.rebalanceByTemperature(df.repartition(11), col("g"),
      col("id"), alpha = 0.5, seed = "s")
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("rebalanceByTemperature boundary alphas and null handling") {
    val df = ids.withColumn("g", when(col("id") % 4 === 0, lit(null)).otherwise("a"))
    // alpha = 1: identity up to null-group drops
    assert(Sampling.rebalanceByTemperature(df, col("g"), col("id"), 1.0)
      .count() == 1500)
    intercept[IllegalArgumentException](
      Sampling.rebalanceByTemperature(df, col("g"), col("id"), 0.0))
    intercept[IllegalArgumentException](
      Sampling.rebalanceByTemperature(df, col("g"), col("id"), 1.5))
    // single group ⇒ rate 1 at any alpha: nothing dropped beyond null groups
    assert(Sampling.rebalanceByTemperature(df, col("g"), col("id"), 0.3)
      .count() == 1500)
  }

  test("sampling decisions survive repartitioning (retry/layout independence)") {
    val one = Sampling.sampleByHash(ids.repartition(1), col("id"), 0.3, "s")
      .as[Long].collect().toSet
    val many = Sampling.sampleByHash(ids.repartition(13), col("id"), 0.3, "s")
      .as[Long].collect().toSet
    assert(one == many)
  }

  test("upsampleByRate: expected multiplier, whole/fractional split, nulls") {
    val df = (1L to 10000L).toDF("id")
    val up = Sampling.upsampleByRate(df, col("id"), rate = 2.5, seed = "u")
    val n = up.count()
    // realized multiplier: 2 + Bin(10000, 0.5)/10000 — within ±2% of 2.5
    assert(math.abs(n - 25000.0) < 500, s"multiplier off: $n")
    // every id has 2 or 3 copies, indexed 0..copies-1
    val counts = up.groupBy("id").count().select("count").distinct()
      .as[Long].collect().toSet
    assert(counts == Set(2L, 3L))
    val idxs = up.filter(col("id") === 1).select("copy_idx")
      .as[Long].collect().toSeq.sorted
    assert(idxs == (0L until idxs.length).toSeq)
    // integer rate: exact
    assert(Sampling.upsampleByRate(df, col("id"), 3.0).count() == 30000)
    // rate < 1 degrades to sampleByHash: same kept keys, all copy_idx 0
    val down = Sampling.upsampleByRate(df, col("id"), 0.3, "s")
    val kept = Sampling.sampleByHash(df, col("id"), 0.3, "s")
    assert(down.select("id").as[Long].collect().toSet ==
      kept.as[Long].collect().toSet)
    assert(down.select("copy_idx").distinct().as[Long].collect().toSeq == Seq(0L))
    // null keys: floor copies only (no hash bucket for the fractional part)
    val nulls = Seq(Option.empty[java.lang.Long], Some(java.lang.Long.valueOf(7L)))
      .toDF("id")
    assert(Sampling.upsampleByRate(nulls, col("id"), 2.5, "u")
      .filter(col("id").isNull).count() == 2)
    intercept[IllegalArgumentException](
      Sampling.upsampleByRate(df, col("id"), 0.0))
    intercept[IllegalArgumentException](
      Sampling.upsampleByRate(df.withColumn("copy_idx", lit(1)), col("id"), 2.0))
  }

  test("upsampleByRate is map-only — the explode fuses into the scan") {
    val p = Sampling.upsampleByRate((1L to 10L).toDF("id"), col("id"), 2.5, "u")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"upsample shuffled:\n$p")
  }

  test("assignSplitByContent co-locates duplicates and formatting variants") {
    val splits = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    // 200 distinct texts, each present 3×: verbatim, re-cased+punctuated,
    // re-spaced — one content group per i, three rows each
    val rows = (1 to 200).flatMap { i =>
      Seq((i * 3L, s"the quick document number $i"),
        (i * 3L + 1, s"The QUICK document, number $i!"),
        (i * 3L + 2, s"  the   quick document\tnumber $i "))
    } ++ Seq((900L, null: String), (901L, ""), (902L, " \t "))
    val out = Sampling.assignSplitByContent(rows.toDF("id", "text"),
      col("text"), splits, seed = "t")
    // every content group — including the null/empty/blank trio, which all
    // canonicalize to "" — sits in exactly one split
    val perGroup = out
      .withColumn("canon", graft.text.TextStats.normalizeForDedup(col("text")))
      .groupBy("canon").agg(countDistinct("split").as("n"))
    assert(perGroup.agg(max("n")).as[Long].head() == 1L)
    assert(out.filter(col("id") >= 900L).select("split").distinct().count() == 1)
    // no split starves: 200 groups at (.5,.25,.25) lands well off the edges
    val byCounts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byCounts.keySet == Set("train", "val", "test"))
    assert(byCounts("train") > byCounts("val") && byCounts("train") > byCounts("test"))
    // map-only: assignment adds no shuffle over the scan
    val p = Sampling.assignSplitByContent(rows.toDF("id", "text"), col("text"),
      splits, seed = "t").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"content split shuffled:\n$p")
  }

  test("negativeSamples: anchor-free, complete, retry-deterministic (X52)") {
    val corpus = (0L until 100L).toDF("id")
    val negs = Sampling.negativeSamples(corpus, "id", k = 4, buckets = 8,
        seed = "t").as[(Long, Int, Long)].collect()
    // the structural contract: a draw NEVER returns the anchor itself —
    // with every bucket head being some anchor, the runner-up fallback is
    // exercised whenever an anchor draws its own bucket
    assert(negs.forall { case (a, _, n) => a != n })
    // 8 buckets × ~12 candidates: no singleton-bucket drops, so every
    // anchor gets all 4 draws, indexed 0..3
    assert(negs.length == 400)
    assert(negs.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)))
    // negatives are drawn from bucket heads: few distinct values by design
    // (the shared-negatives regime) — but more than one
    val distinctNegs = negs.map(_._3).distinct.length
    assert(distinctNegs > 1 && distinctNegs <= 16, s"got $distinctNegs")
    // identical under re-partitioning (no RNG anywhere)
    val again = Sampling.negativeSamples(corpus.repartition(7), "id", k = 4,
        buckets = 8, seed = "t").as[(Long, Int, Long)].collect()
    assert(negs.sorted.toSeq == again.sorted.toSeq)
    intercept[IllegalArgumentException](
      Sampling.negativeSamples(corpus, "id", k = 0))
    intercept[IllegalArgumentException](
      Sampling.negativeSamples(corpus, "id", k = 1, buckets = 1))
    // duplicated candidate ids must not elect themselves head AND
    // runner-up (which would hand an anchor itself as its negative) —
    // candidates are distinct'd inside the operator
    val dup = corpus.union(corpus)
    val dupNegs = Sampling.negativeSamples(dup, "id", k = 4, buckets = 8,
        seed = "t").as[(Long, Int, Long)].collect()
    assert(dupNegs.forall { case (a, _, n) => a != n })
  }

  test("doremiMixture replays the fixed-point trajectory exactly (X71)") {
    val micro = 1000000L
    val docs = Seq(
      ("web", 400000L), ("web", 200000L), ("web", 150001L),
      ("code", 50000L), ("code", -80000L), // negative clips to 0
      ("wiki", 0L), ("wiki", 10000L),
      ("books", 900000L)).toDF("dom", "loss")
    val rounds = 4
    val lr = 500000L
    val out = Sampling.doremiMixture(docs, col("dom"), col("loss"),
        rounds = rounds, lrMicro = lr)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // independent replay of the fixed-point loop from the raw rows
    val per = Seq(
      ("books", 1L, Seq(900000L)), ("code", 2L, Seq(50000L, -80000L)),
      ("web", 3L, Seq(400000L, 200000L, 150001L)), ("wiki", 2L, Seq(0L, 10000L)))
    val meanL = per.map { case (_, n, ls) => ls.map(math.max(_, 0L)).sum / n }
    val d = per.length
    var w = Array.fill(d)(micro / d)
    val alphaSum = Array.fill(d)(0L)
    for (_ <- 1 to rounds) {
      val raw = Array.tabulate(d)(i =>
        w(i) * math.round(math.exp((lr * meanL(i)).toDouble / 1e12) * micro) / micro)
      val s = raw.sum
      w = raw.map(r => r * micro / s)
      for (i <- 0 until d) alphaSum(i) += w(i)
    }
    val expect = per.indices.map(i =>
      (per(i)._1, per(i)._2, meanL(i), w(i), alphaSum(i) / rounds))
    assert(out.toSeq == expect,
      s"trajectory drift:\n got    ${out.toSeq}\n expect $expect")
    // the mixture up-weights the lagging domain and down-weights the easy one
    val byDom = out.map(r => r._1 -> r._4).toMap
    assert(byDom("books") > byDom("wiki"))
    // floor-renormalized weights sum to ≤ Micro with deficit < D
    assert(w.sum <= micro && w.sum > micro - d)
    // determinism under re-partitioning (the corpus pass is one agg)
    val again = Sampling.doremiMixture(docs.repartition(7), col("dom"),
        col("loss"), rounds = rounds, lrMicro = lr)
      .collect().map(r => (r.getString(0), r.getLong(3))).sortBy(_._1)
    assert(again.toSeq == out.map(r => (r._1, r._4)).toSeq)
    // guards: the exp(15) fixed-point range (division form — immune to
    // Long wrap), domain-cardinality cap, empty input
    intercept[IllegalArgumentException](Sampling.doremiMixture(
      Seq(("a", Long.MaxValue / 2)).toDF("d", "l"), col("d"), col("l")))
    intercept[IllegalArgumentException](Sampling.doremiMixture(
      docs, col("dom"), col("loss"), maxDomains = 2))
    intercept[IllegalArgumentException](Sampling.doremiMixture(
      docs.filter(col("dom").isNull), col("dom"), col("loss")))
  }

  test("kFoldAssign: exact per-stratum balance, key co-location (X85)") {
    // 3 strata with deliberately awkward sizes: 10, 7, 1
    val rows = (1 to 10).map(i => ("a", i.toLong)) ++
      (11 to 17).map(i => ("b", i.toLong)) ++ Seq(("c", 99L))
    val df = rows.toDF("lang", "id")
    val out = Sampling.kFoldAssign(df, col("id"), Seq("lang"), k = 3,
        seed = "kf")
      .as[(String, Long, Int)].collect()
    // exact balance: within each stratum fold sizes differ by <= 1
    val sizes = out.groupBy(r => (r._1, r._3)).view.mapValues(_.length)
    for (s <- Seq("a", "b")) {
      val perFold = (0 until 3).map(f => sizes.getOrElse((s, f), 0))
      assert(perFold.max - perFold.min <= 1, s"$s unbalanced: $perFold")
    }
    assert(out.filter(_._1 == "a").map(_._3).toSet == Set(0, 1, 2))
    // duplicated keys co-locate: duplicate every 'a' row, folds unchanged
    val dup = Sampling.kFoldAssign(df.unionAll(df.filter(col("lang") === "a")),
        col("id"), Seq("lang"), k = 3, seed = "kf")
      .as[(String, Long, Int)].collect()
    assert(dup.groupBy(r => (r._1, r._2)).values.forall(_.map(_._3).toSet.size == 1),
      "a key landed in two folds")
    assert(dup.filter(r => r._1 == "a").toSet == out.filter(_._1 == "a").toSet)
    // determinism under repartition
    val again = Sampling.kFoldAssign(df.repartition(7), col("id"),
        Seq("lang"), k = 3, seed = "kf")
      .as[(String, Long, Int)].collect().toSet
    assert(again == out.toSet)
  }

  test("kFoldAssign: straddling keys refused; NULLs; guards") {
    val df = Seq(("a", 1L), ("b", 1L)).toDF("lang", "id")
    val e = intercept[IllegalArgumentException](
      Sampling.kFoldAssign(df, col("id"), Seq("lang"), k = 2))
    assert(e.getMessage.contains("multiple strata"))
    // NULL key → NULL fold; NULL stratum is a real group
    val n = Sampling.kFoldAssign(
        Seq((Some("a"), Some(1L)), (Some("a"), None), (None, Some(2L)))
          .toDF("lang", "id"),
        col("id"), Seq("lang"), k = 2)
      .as[(Option[String], Option[Long], Option[Int])].collect().toSet
    assert(n.exists(r => r._2.isEmpty && r._3.isEmpty), s"got $n")
    assert(n.exists(r => r._1.isEmpty && r._3.isDefined), s"got $n")
    intercept[IllegalArgumentException](
      Sampling.kFoldAssign(df, col("id"), Seq("lang"), k = 1))
    intercept[IllegalArgumentException](
      Sampling.kFoldAssign(df, col("id"), Nil, k = 2))
  }
}
