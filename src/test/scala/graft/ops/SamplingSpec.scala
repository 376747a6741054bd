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

  test("sampling decisions survive repartitioning (retry/layout independence)") {
    val one = Sampling.sampleByHash(ids.repartition(1), col("id"), 0.3, "s")
      .as[Long].collect().toSet
    val many = Sampling.sampleByHash(ids.repartition(13), col("id"), 0.3, "s")
      .as[Long].collect().toSet
    assert(one == many)
  }
}
