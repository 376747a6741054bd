package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("proximityJoin: hand-pinned pairs, boundary inclusivity, cell edges (X90)") {
    // radius 10: (1,(0,0))–(2,(10,0)) exactly AT the radius — included;
    // (3,(5,5)) near both; (4,(100,100)) isolated; (5,(19,0)) is within
    // 10 of 2 but sits two cells from 1 — the 3×3 probe must still pair
    // (2,5) and must NOT pair (1,5)
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 5L, 5L),
      (4L, 100L, 100L), (5L, 19L, 0L)).toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, col("id"), col("x"), col("y"), 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 100L), (1L, 3L, 50L), (2L, 3L, 50L),
      (2L, 5L, 81L)), s"got $got")
  }

  test("proximityJoin: equals the brute-force join on a hashed point cloud") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val pts = (1 to 300).map { i =>
      val h = md.digest(s"pt:$i".getBytes("UTF-8"))
      (i.toLong,
        ((h(0) & 0xff) * 256L + (h(1) & 0xff)) * 4,
        ((h(2) & 0xff) * 256L + (h(3) & 0xff)) * 4)
    }
    val r = 3000L
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet
    assert(brute.nonEmpty, "fixture produced no pairs — retune")
    val df = pts.toDF("id", "x", "y")
    val got = Spatial.proximityJoin(df, col("id"), col("x"), col("y"), r)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, s"grid join diverged: missing=" +
      s"${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    // determinism under repartition
    val again = Spatial.proximityJoin(df.repartition(7), col("id"),
      col("x"), col("y"), r).as[(Long, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("proximityJoin: guards — negative coords, radius bounds, NULL drop") {
    val bad = Seq((1L, -5L, 0L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException](
      Spatial.proximityJoin(bad, col("id"), col("x"), col("y"), 10L))
    assert(e.getMessage.contains("negative coordinate"))
    val ok = Seq((1L, 1L, 1L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](
      Spatial.proximityJoin(ok, col("id"), col("x"), col("y"), 0L))
    intercept[IllegalArgumentException](
      Spatial.proximityJoin(ok, col("id"), col("x"), col("y"), 2000000000L))
    val withNull = Seq((Some(1L), Some(1L), Some(1L)),
      (Some(2L), None, Some(1L)), (Some(3L), Some(2L), Some(1L)))
      .toDF("id", "x", "y")
    val got = Spatial.proximityJoin(withNull, col("id"), col("x"),
      col("y"), 10L).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L)), s"got $got")
  }
}
