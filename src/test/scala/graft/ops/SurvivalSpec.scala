package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring, floor trajectory (X104)") {
    // durations (event?): 1†, 2†, 2 censored, 3† — the classic worked
    // example: S(1) = 3/4, S(2) = 3/4 · 2/3 = 1/2 (the censored subject
    // left the risk set WITHOUT an event), S(3) = 1/2 · 0/1 = 0
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, false),
      ("g", 3L, true)).toDF("grp0", "dur", "ev")
    val got = Survival.kaplanMeier(df, col("grp0"), col("dur"), col("ev"))
      .orderBy("grp", "t")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("g", 1L, 4L, 1L, 750000L),
      ("g", 2L, 3L, 1L, 500000L),
      ("g", 3L, 1L, 1L, 0L)), s"got $got")
    // a censor-only time creates NO step; all-censored groups emit none;
    // groups fold independently; NULL group is the real "(null)" group
    val mixed = Seq(
      ("a", 5L, false), ("a", 7L, true),
      ("b", 1L, false), ("b", 2L, false),
      (null.asInstanceOf[String], 1L, true)).toDF("grp0", "dur", "ev")
    val m = Survival.kaplanMeier(mixed, col("grp0"), col("dur"), col("ev"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(m == Set(("a", 7L, 1L, 1L, 0L), ("(null)", 1L, 1L, 1L, 0L)),
      s"got $m")
    // determinism + guards
    assert(Survival.kaplanMeier(df.repartition(5), col("grp0"), col("dur"),
        col("ev")).orderBy("grp", "t")
      .as[(String, Long, Long, Long, Long)].collect().toSeq == got)
    intercept[IllegalArgumentException](Survival.kaplanMeier(
      Seq(("g", -1L, true)).toDF("grp0", "dur", "ev"),
      col("grp0"), col("dur"), col("ev")))
    intercept[IllegalArgumentException](Survival.kaplanMeier(
      Seq(("g", 1L, true), ("g", 2L, true)).toDF("grp0", "dur", "ev"),
      col("grp0"), col("dur"), col("ev"), maxSteps = 1))
  }
}
