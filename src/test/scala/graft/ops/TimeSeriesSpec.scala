package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:30:00")

  test("gapFill emits every bucket in each key's range, zeros where asked") {
    val events = Seq(
      ("a", ts(1), 10.0), ("a", ts(1), 20.0), ("a", ts(4), 5.0), // a: gap at 2,3
      ("b", ts(2), 1.0)                                          // b: single bucket
    ).toDF("k", "t", "v")
    val out = TimeSeries.gapFill(events, Seq("k"), "t", "1 hour",
        Seq("n" -> count(lit(1)), "total" -> Ops.sumDec(col("v"))),
        fill = Map("n" -> lit(0L)))
      .orderBy("k", "bucket")
      .select(col("k"), hour(col("bucket")).as("h"), col("n"), col("total"))
      .as[(String, Int, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", 1, 2L, Some(30.0)),
      ("a", 2, 0L, None), // gap: count fills 0, gauge stays null
      ("a", 3, 0L, None),
      ("a", 4, 1L, Some(5.0)),
      ("b", 2, 1L, Some(1.0))))
  }

  test("gapFill: null key is a real group; null ts rows are ignored") {
    val events = Seq(
      (Some("a"), Some(ts(1))), (None, Some(ts(1))), (None, Some(ts(3))),
      (Some("a"), None) // no bucket — ignored
    ).toDF("k", "t")
    val out = TimeSeries.gapFill(events, Seq("k"), "t", "1 hour",
        Seq("n" -> count(lit(1))), fill = Map("n" -> lit(0L)))
      .orderBy("k", "bucket")
      .select(col("k"), hour(col("bucket")).as("h"), col("n"))
      .as[(Option[String], Int, Long)].collect().toSeq
    // null-key group spans hours 1..3 with a gap at 2; "a" has hour 1 only
    assert(out == Seq(
      (None, 1, 1L), (None, 2, 0L), (None, 3, 1L), (Some("a"), 1, 1L)))
    intercept[IllegalArgumentException](
      TimeSeries.gapFill(events, Seq("k"), "t", "1 hour", Seq.empty))
    intercept[IllegalArgumentException](
      TimeSeries.gapFill(events, Seq("k"), "t", "1 hour",
        Seq("n" -> count(lit(1))), fill = Map("zzz" -> lit(0))))
  }
}
