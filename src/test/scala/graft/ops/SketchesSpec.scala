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
}
