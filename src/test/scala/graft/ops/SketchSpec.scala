package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sketch-based aggregation path (SURVEY §2.4): HyperLogLog++ distinct
  * counts and quantile sketches — the sub-linear-memory substitutes for
  * exact aggregation when a 100 TB scan can tolerate bounded error. No
  * driver-gate oracle (sketch values are implementation-specific across
  * engines), so accuracy is pinned here against the exact answers. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) lands within its configured rsd") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .head().getLong(0)
    // 2% rsd → 3 sigma ≈ 6%; generous bound keeps the test deterministic
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile tracks the exact percentile") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val Seq(exactMed, approxMed) = orders.select(
        expr("percentile(o_totalprice, 0.5)"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)"))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    // accuracy parameter 1000 → rank error ≤ n/1000; value tolerance loose
    assert(math.abs(approxMed - exactMed) / exactMed < 0.02,
      s"approx $approxMed vs exact $exactMed")
  }
}
