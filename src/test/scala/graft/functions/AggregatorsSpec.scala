package graft.functions

import org.apache.spark.sql.functions.udaf

import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("WeightedMean aggregates partial+final like a built-in (§2.8)") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("x", "w").repartition(2)
    val wm = udaf(Aggregators.WeightedMean)
    val got = df.agg(wm($"x", $"w").as("m")).as[Double].head()
    assert(got == (10.0 * 1 + 20.0 * 3) / 4)
  }

  test("WeightedMean registered for SQL use") {
    spark.udf.register("wmean", udaf(Aggregators.WeightedMean))
    val r = spark.sql("SELECT wmean(x, w) FROM VALUES (1.0, 1.0), (3.0, 1.0) AS t(x, w)")
      .as[Double].head()
    assert(r == 2.0)
  }
}
