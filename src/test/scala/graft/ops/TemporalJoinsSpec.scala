package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    ("a", 0L, 100), ("a", 1L, 101), ("a", 3L, 103), ("a", 5L, 105), ("a", 7L, 107),
    ("b", 4L, 204)
  ).toDF("k", "t", "ev")

  private def right = Seq(
    ("a", 1L, "x"), ("a", 5L, "y"), ("c", 1L, "z")
  ).toDF("k", "t", "state")

  test("asofJoin backward-inclusive: latest state at or before each event") {
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t")
      .orderBy("k", "t")
      .select("k", "t", "ev", "state").as[(String, Long, Int, Option[String])]
      .collect().toSeq
    assert(out == Seq(
      ("a", 0L, 100, None),       // nothing yet
      ("a", 1L, 101, Some("x")),  // inclusive: state at t=1 matches
      ("a", 3L, 103, Some("x")),
      ("a", 5L, 105, Some("y")),
      ("a", 7L, 107, Some("y")),
      ("b", 4L, 204, None)))      // key with no states at all
  }

  test("asofJoin strict: state strictly before each event") {
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t", strict = true)
      .orderBy("k", "t")
      .select("t", "state").as[(Long, Option[String])].collect().toSeq
      .filter(_ => true)
    assert(out.take(5) == Seq(
      (0L, None), (1L, None), (3L, Some("x")), (5L, Some("x")), (7L, Some("y"))))
  }

  test("asofJoin carries a genuinely-null payload value, not a stale older one") {
    // the latest state row at t=6 has state=null; an event at t=7 must see
    // null (the true latest state), NOT "y" from t=5 — carrying payload
    // columns individually through last(ignoreNulls) would leak "y"
    val rightWithNull = Seq(
      ("a", 1L, Some("x")), ("a", 5L, Some("y")), ("a", 6L, None: Option[String])
    ).toDF("k", "t", "state")
    val out = TemporalJoins.asofJoin(left, rightWithNull, Seq("k"), "t", "t")
      .filter(col("k") === "a").orderBy("t")
      .select("t", "state").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(
      (0L, None), (1L, Some("x")), (3L, Some("x")), (5L, Some("y")), (7L, None)))
  }

  test("asofJoin rejects payload/left column collisions") {
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(left, right.withColumnRenamed("state", "ev"),
        Seq("k"), "t", "t"))
  }

  test("asofJoin rejects reserved internal column names (__ts/__side/__pl)") {
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(left.withColumn("__pl", lit(1)), right, Seq("k"), "t", "t"))
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(left, right.withColumn("__side", lit(1)), Seq("k"), "t", "t"))
  }

  test("rangeJoin matches points inside intervals across bin boundaries") {
    val points = Seq(("a", 5L), ("a", 10L), ("a", 99L), ("b", 5L))
      .toDF("k", "p")
    // interval [4, 11] spans bins 0 and 1 at binWidth 10 — the explode must
    // place it in both so the point at 10 (bin 1) still matches
    val intervals = Seq(("a", 4L, 11L, "i1"), ("a", 50L, 60L, "i2"), ("b", 6L, 9L, "i3"))
      .toDF("k", "s", "e", "iv")
    val out = TemporalJoins.rangeJoin(points, intervals, Seq("k"), "p", "s", "e", 10L)
      .select("k", "p", "iv").as[(String, Long, String)].collect().toSet
    assert(out == Set(("a", 5L, "i1"), ("a", 10L, "i1")))
  }
}
