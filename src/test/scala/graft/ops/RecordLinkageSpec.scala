package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // labeled pairs: 3 matches (name agrees on 2), 5 non-matches (name
  // agrees on 1); phone agrees on all matches and no non-match
  private def labeled = Seq(
    (true, true, true), (true, true, true), (true, false, true),
    (false, false, false), (false, true, false), (false, false, false),
    (false, false, false), (false, false, false))
    .toDF("is_m", "name_eq", "phone_eq")

  private val fields = Seq("name" -> col("name_eq"),
    "phone" -> col("phone_eq"))

  test("fsWeights: Laplace-smoothed m/u micros and the stated weight chain (X128)") {
    val ws = RecordLinkage.fsWeights(labeled, fields, col("is_m"))
    // hand arithmetic: m_name = (2+1)e6/(3+2) = 600000,
    // u_name = (1+1)e6/(5+2) = 285714; m_phone = (3+1)e6/5 = 800000,
    // u_phone = (0+1)e6/7 = 142857
    def w(n: Long, d: Long) =
      math.round(1e6 * math.log(n.toDouble / d.toDouble) / math.log(2.0))
    assert(ws == Seq(
      ("name", 600000L, 285714L, w(600000L, 285714L),
        w(400000L, 714286L)),
      ("phone", 800000L, 142857L, w(800000L, 142857L),
        w(200000L, 857143L))), s"got $ws")
    // evidence orientation: agreement on a discriminative field is
    // positive weight, disagreement negative
    ws.foreach { case (f, m, u, wa, wd) =>
      assert(m > u && wa > 0 && wd < 0, s"$f weights misoriented: $wa/$wd")
    }
  }

  test("fsScore: exact integer sums in field order; NULL flag scores 0 (X128)") {
    val ws = RecordLinkage.fsWeights(labeled, fields, col("is_m"))
    val Seq((_, _, _, waN, wdN), (_, _, _, waP, wdP)) = ws
    val pairs = Seq(
      (1L, Some(true), Some(true)),
      (2L, Some(false), Some(true)),
      (3L, Some(true), None), // missing phone: no evidence, weight 0
      (4L, Some(false), Some(false)))
      .toDF("pid", "name_eq", "phone_eq")
    val got = RecordLinkage.fsScore(pairs, labeled, fields, col("is_m"))
      .select("pid", "fs_score_micro").as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> (waN + waP), 2L -> (wdN + waP),
      3L -> waN, 4L -> (wdN + wdP)), s"got $got")
    // determinism under repartition
    assert(RecordLinkage.fsScore(pairs.repartition(5), labeled, fields,
      col("is_m")).select("pid", "fs_score_micro")
      .as[(Long, Long)].collect().toMap == got)
  }

  test("fsWeightsEM: hand-walked E/M step, recovery, determinism (X129)") {
    // F = 1, 40 agreeing pairs + 60 disagreeing; init p=.5, m=.9, u=.1:
    // w(agree) = (.5·.9)/(.5·.9 + .5·.1) = 900000µ; w(disagree) = 100000µ
    // p' = (40·9e5 + 60·1e5)/100 = 420000
    // m' = 36e6·1e6 // 42e6 = 857142; u' = 4e6·1e6 // 58e6 = 68965
    val pairs = (Seq.fill(40)(true) ++ Seq.fill(60)(false)).toDF("agree")
    val one = RecordLinkage.fsWeightsEM(pairs, Seq("f" -> col("agree")),
      iters = 1, pInitMicro = 500000L, mInitMicro = 900000L,
      uInitMicro = 100000L)
    assert(one.prevalenceMicro == 420000L, s"p' = ${one.prevalenceMicro}")
    val (_, m1, u1, _, _) = one.weights.head
    assert((m1, u1) == ((857142L, 68965L)), s"got ($m1, $u1)")
    // a separable mixture: EM drives m up and u down without labels,
    // and the learned orientation matches the supervised weights' sign
    val mix = ((1 to 50).map(_ => (true, true)) ++ // matches: agree both
      (1 to 400).map(i => (i % 20 == 0, i % 25 == 0))) // noise: rare agree
      .toDF("f1", "f2")
    val em = RecordLinkage.fsWeightsEM(mix,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), iters = 15)
    em.weights.foreach { case (f, m, u, wa, wd) =>
      assert(m > u && wa > 0 && wd < 0,
        s"$f not separated: m=$m u=$u wa=$wa wd=$wd")
    }
    // determinism under repartition (one aggregation + a driver fold)
    val em2 = RecordLinkage.fsWeightsEM(mix.repartition(7),
      Seq("f1" -> col("f1"), "f2" -> col("f2")), iters = 15)
    assert(em2 == em)
    // guards: field budget, iteration bounds, init ranges, empty input
    intercept[IllegalArgumentException](RecordLinkage.fsWeightsEM(
      mix, (1 to 13).map(i => s"f$i" -> col("f1")), iters = 5))
    intercept[IllegalArgumentException](RecordLinkage.fsWeightsEM(
      mix, Seq("f1" -> col("f1")), iters = 0))
    intercept[IllegalArgumentException](RecordLinkage.fsWeightsEM(
      mix, Seq("f1" -> col("f1")), pInitMicro = 0L))
    intercept[IllegalArgumentException](RecordLinkage.fsWeightsEM(
      mix.filter(lit(false)), Seq("f1" -> col("f1"))))
  }

  test("reciprocalBestMatch: mutual-best only, stated ties, dup collapse (X130)") {
    val pairs = Seq(
      (1L, 10L, 100L), // 1↔10 mutual best → kept
      (1L, 11L, 50L),
      (2L, 10L, 80L),  // 2's best is 10, but 10 prefers 1 → 2 UNMATCHED
      (2L, 11L, 40L),  // ...and 2 does NOT fall back to its second choice
      (3L, 12L, 60L), (3L, 13L, 60L), // tie: smallest partner id (12) wins
      (4L, 13L, 70L),
      (4L, 13L, 90L)   // duplicate pair: collapses to max(90) first
    ).toDF("l", "r", "s")
    val got = RecordLinkage.reciprocalBestMatch(pairs, col("l"), col("r"),
      col("s")).as[(Long, Long, Long)].collect().toSet
    // 13's candidates: 3@60, 4@90 → 13 prefers 4; 4's best is 13 → kept.
    // 3's best is 12 (tie at 60 broken to smaller id); 12's best is 3.
    assert(got == Set((1L, 10L, 100L), (3L, 12L, 60L), (4L, 13L, 90L)),
      s"got $got")
    // every record appears at most once per side — the one-to-one contract
    assert(got.map(_._1).size == got.size && got.map(_._2).size == got.size)
    // determinism under repartition
    assert(RecordLinkage.reciprocalBestMatch(pairs.repartition(7), col("l"),
      col("r"), col("s")).as[(Long, Long, Long)].collect().toSet == got)
  }

  test("fsWeights guards: one-class labels, duplicate fields, field budget (X128)") {
    intercept[IllegalArgumentException](RecordLinkage.fsWeights(
      labeled.filter(col("is_m")), fields, col("is_m")))
    intercept[IllegalArgumentException](RecordLinkage.fsWeights(
      labeled, Seq("x" -> col("name_eq"), "x" -> col("phone_eq")),
      col("is_m")))
    intercept[IllegalArgumentException](RecordLinkage.fsWeights(
      labeled, fields, col("is_m"), maxFields = 1))
    intercept[IllegalArgumentException](RecordLinkage.fsScore(
      labeled.withColumn("fs_score_micro", lit(1L)), labeled, fields,
      col("is_m")))
  }
}
