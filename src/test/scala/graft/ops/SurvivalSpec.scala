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

  test("kaplanMeierCI: Greenwood band replica, n=d poisons variance (X116)") {
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, false),
      ("g", 3L, true)).toDF("grp0", "dur", "ev")
    // independent replica of the documented chain: floored nano terms,
    // then r = sqrt(gw/1e9), se = round(S·r), margin = round(z·(S·r))
    def band(s: Long, gw: Long): (Long, Long, Long) = {
      val r = math.sqrt(gw.toDouble / 1e9)
      val se = math.round(s.toDouble * r)
      val m = math.round(1.959964 * (s.toDouble * r))
      (se, math.max(0L, s - m), math.min(1000000L, s + m))
    }
    val gw1 = 1000000000L / (4 * 3)              // d=1, n=4
    val gw2 = gw1 + 1000000000L / (3 * 2)        // d=1, n=3
    val (se1, lo1, hi1) = band(750000L, gw1)
    val (se2, lo2, hi2) = band(500000L, gw2)
    val got = Survival.kaplanMeierCI(df, col("grp0"), col("dur"), col("ev"))
      .orderBy("t")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSeq
    assert(got == Seq(
      ("g", 1L, 4L, 1L, 750000L, Some(se1), Some(lo1), Some(hi1)),
      ("g", 2L, 3L, 1L, 500000L, Some(se2), Some(lo2), Some(hi2)),
      // n = d at the last step: S hits 0 and the Greenwood term is
      // infinite — variance undefined, not zero
      ("g", 3L, 1L, 1L, 0L, None, None, None)), s"got $got")
    // the survival column is bit-identical to the plain face
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      Survival.kaplanMeier(df, col("grp0"), col("dur"), col("ev"))
        .orderBy("t").as[(String, Long, Long, Long, Long)].collect().toSeq)
    assert(Survival.kaplanMeierCI(df.repartition(5), col("grp0"),
      col("dur"), col("ev")).orderBy("t")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSeq == got)
  }

  test("logRank: hand-walked O/E/V accumulation, guards (X116)") {
    // a: 1†, 2†;  b: 2†, 3 censored
    // t=1: nA=2 nB=2 N=4 d=1 → eA += 500000, V += 1·2·2·3·1e9/48
    // t=2: nA=1 nB=2 N=3 d=2 → eA += 666666, V += 2·1·2·1·1e9/18
    // t=3: only a censor — no event, no term
    val df = Seq(("a", 1L, true), ("a", 2L, true),
      ("b", 2L, true), ("b", 3L, false)).toDF("grp0", "dur", "ev")
    val ea = 1L * 2 * 1000000L / 4 + 2L * 1 * 1000000L / 3
    val eb = 1L * 2 * 1000000L / 4 + 2L * 2 * 1000000L / 3
    val v = 1L * 2 * 2 * 3 * 1000000000L / (4L * 4 * 3) +
      2L * 1 * 2 * 1 * 1000000000L / (3L * 3 * 2)
    val dd = (2L * 1000000L - ea).toDouble
    val chi2 = math.round(dd * dd / v.toDouble * 1000.0)
    val got = Survival.logRank(df, col("grp0"), col("dur"), col("ev"))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long,
        Option[Long])].collect().toSeq
    assert(got == Seq(("a", "b", 2L, 2L, 2L, ea, 1L, eb, v, Some(chi2))),
      s"got $got (expected ea=$ea eb=$eb v=$v chi2=$chi2)")
    assert(Survival.logRank(df.repartition(5), col("grp0"), col("dur"),
      col("ev")).as[(String, String, Long, Long, Long, Long, Long, Long,
        Long, Option[Long])].collect().toSeq == got)
    // identical groups → dd ≈ 0 within floor grain; chi2 tiny but defined
    val same = Seq(("a", 1L, true), ("a", 2L, true),
      ("b", 1L, true), ("b", 2L, true)).toDF("grp0", "dur", "ev")
    val s0 = Survival.logRank(same, col("grp0"), col("dur"), col("ev"))
      .select("chi2_micro").as[Option[Long]].collect()(0)
    assert(s0.exists(_ <= 10L), s"identical curves should test ~0, got $s0")
    // guards: group count, maxRisk budget
    intercept[IllegalArgumentException](Survival.logRank(
      Seq(("a", 1L, true)).toDF("grp0", "dur", "ev"),
      col("grp0"), col("dur"), col("ev")))
    intercept[IllegalArgumentException](Survival.logRank(
      Seq(("a", 1L, true), ("b", 1L, true), ("c", 1L, true))
        .toDF("grp0", "dur", "ev"), col("grp0"), col("dur"), col("ev")))
    intercept[IllegalArgumentException](Survival.logRank(df, col("grp0"),
      col("dur"), col("ev"), maxRisk = 3L))
  }

  test("logRankK: pairwise sweep equals per-pair logRank, Bonferroni m (X125)") {
    // three cohorts on visibly different clocks
    val df = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 3L, false),
      ("b", 2L, true), ("b", 4L, true), ("b", 5L, false),
      ("c", 5L, true), ("c", 6L, true), ("c", 7L, false))
      .toDF("grp0", "dur", "ev")
    val sweep = Survival.logRankK(df, col("grp0"), col("dur"), col("ev"))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long,
        Option[Long], Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(sweep.map(r => (r._1, r._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(sweep.forall(_._11 == 3L), "m_tests must be k(k-1)/2 = 3")
    // each pair row IS the two-group statistic on the filtered frame
    sweep.foreach { r =>
      val pair = Survival.logRank(
        df.filter(col("grp0").isin(r._1, r._2)),
        col("grp0"), col("dur"), col("ev"))
        .as[(String, String, Long, Long, Long, Long, Long, Long,
          Long, Option[Long])].collect()(0)
      assert(pair == ((r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8,
        r._9, r._10)), s"pair (${r._1},${r._2}) drifted: $pair vs $r")
    }
    // guards: fewer than two groups; key-like group column refused
    intercept[IllegalArgumentException](Survival.logRankK(
      Seq(("a", 1L, true)).toDF("grp0", "dur", "ev"),
      col("grp0"), col("dur"), col("ev")))
    intercept[IllegalArgumentException](Survival.logRankK(df, col("grp0"),
      col("dur"), col("ev"), maxGroups = 2))
  }

  test("logRankOmnibus: k=2 is bit-equal to logRank; k=3 matches a BigInt " +
      "O/E/V replay + the stated elimination chain; degenerates (X138)") {
    val df = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 3L, false),
      ("b", 2L, true), ("b", 4L, true), ("b", 5L, false),
      ("c", 5L, true), ("c", 6L, true), ("c", 7L, false))
      .toDF("grp0", "dur", "ev")
    // k = 2: the omnibus IS the two-group test (shared presentation)
    val two = df.filter(col("grp0").isin("a", "b"))
    val omni2 = Survival.logRankOmnibus(two, col("grp0"), col("dur"),
        col("ev")).orderBy("grp")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    val pair = Survival.logRank(two, col("grp0"), col("dur"), col("ev"))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long,
        Option[Long])].collect()(0)
    assert(omni2 == Seq(
      ("a", pair._3, pair._5, pair._6, 2L, 1L, pair._10),
      ("b", pair._4, pair._7, pair._8, 2L, 1L, pair._10)), s"got $omni2")
    // k = 3: replay O/E/V in BigInt over the pooled risk walk, then the
    // stated 2×2 elimination in the same IEEE order
    val got = Survival.logRankOmnibus(df, col("grp0"), col("dur"),
        col("ev")).orderBy("grp")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    val subj = Seq(("a", 1L, true), ("a", 2L, true), ("a", 3L, false),
      ("b", 2L, true), ("b", 4L, true), ("b", 5L, false),
      ("c", 5L, true), ("c", 6L, true), ("c", 7L, false))
    val groups = Seq("a", "b", "c")
    val rem = scala.collection.mutable.Map(
      groups.map(g => g -> subj.count(_._1 == g).toLong): _*)
    val o = scala.collection.mutable.Map(groups.map(_ -> 0L): _*)
    val eM = scala.collection.mutable.Map(groups.map(_ -> 0L): _*)
    val v = Array.fill(2, 2)(0L)
    subj.map(_._2).distinct.sorted.foreach { t =>
      val dG = groups.map(g =>
        g -> subj.count(r => r._1 == g && r._2 == t && r._3).toLong).toMap
      val aG = groups.map(g =>
        g -> subj.count(r => r._1 == g && r._2 == t).toLong).toMap
      val d = dG.values.sum; val n = rem.values.sum
      if (d > 0 && n >= 1) {
        groups.foreach { g =>
          o(g) += dG(g)
          eM(g) += (BigInt(d) * rem(g) * 1000000L / n).toLong
        }
        if (n >= 2) for (i <- 0 until 2; j <- 0 until 2) {
          val (ri, rj) = (rem(groups(i)), rem(groups(j)))
          v(i)(j) +=
            (if (i == j)
              (BigInt(d) * ri * (n - ri) * (n - d) * 1000000000L /
                (BigInt(n) * n * (n - 1))).toLong
            else -(BigInt(d) * ri * rj * (n - d) * 1000000000L /
              (BigInt(n) * n * (n - 1))).toLong)
        }
      }
      groups.foreach(g => rem(g) -= aG(g))
    }
    val (b00, b01, b10, b11) =
      (v(0)(0) / 1e9, v(0)(1) / 1e9, v(1)(0) / 1e9, v(1)(1) / 1e9)
    val u0 = (o("a") * 1000000L - eM("a")) / 1e6
    val u1 = (o("b") * 1000000L - eM("b")) / 1e6
    val m = b10 / b00
    val a11p = b11 - m * b01
    val u1p = u1 - m * u0
    val x1 = u1p / a11p
    val x0 = (u0 - b01 * x1) / b00
    val chi2 = math.round((u0 * x0 + u1 * x1) * 1000000.0)
    assert(got == groups.map(g =>
      (g, 3L, o(g), eM(g), 3L, 2L, Some(chi2))), s"got $got vs chi2 $chi2")
    // all-censored family: zero covariance is singular → NULL, not 0
    val quiet = Seq(("a", 1L, false), ("b", 2L, false), ("c", 3L, false))
      .toDF("grp0", "dur", "ev")
    val nul = Survival.logRankOmnibus(quiet, col("grp0"), col("dur"),
        col("ev")).select("chi2_micro")
      .as[Option[Long]].collect().toSeq
    assert(nul == Seq(None, None, None), s"got $nul")
    // determinism under repartition; group-count guards
    assert(Survival.logRankOmnibus(df.repartition(7), col("grp0"),
        col("dur"), col("ev")).orderBy("grp")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq == got)
    intercept[IllegalArgumentException](Survival.logRankOmnibus(
      Seq(("a", 1L, true)).toDF("grp0", "dur", "ev"),
      col("grp0"), col("dur"), col("ev")))
    intercept[IllegalArgumentException](Survival.logRankOmnibus(df,
      col("grp0"), col("dur"), col("ev"), maxGroups = 2))
  }

  test("nelsonAalen: hand-walked H and Aalen variance, stated band, " +
      "censor-only groups vanish (X140)") {
    // g: events at t=1 (n=3), t=2 (n=2), censored at t=3
    // H: 1e6/3 = 333333; + 1e6/2 → 833333
    // V: 1e12/9 = 111111111111; + 1e12/4 → 361111111111
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 3L, false),
      ("c", 5L, false)).toDF("grp0", "dur", "ev")
    val got = Survival.nelsonAalen(df, col("grp0"), col("dur"), col("ev"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    def band(h: Long, v: Long) = {
      val se = math.sqrt(v.toDouble / 1e12)
      val m = math.round(1.959964 * (se * 1e6))
      (math.round(se * 1e6), math.max(0L, h - m), h + m)
    }
    val b1 = band(333333L, 111111111111L)
    val b2 = band(833333L, 361111111111L)
    assert(got == Seq(
      ("g", 1L, 3L, 1L, 333333L, 111111111111L, b1._1, b1._2, b1._3),
      ("g", 2L, 2L, 1L, 833333L, 361111111111L, b2._1, b2._2, b2._3)),
      s"got $got")
    // an all-censored group has no event steps — no rows, never a fake 0
    assert(!got.exists(_._1 == "c"))
    // the lower band clamps at 0 (hazard is non-negative): one early
    // event among many at-risk gives h << margin
    val wide = (1 to 50).map(i => ("w", 10L, i == 1)).toDF("grp0", "dur", "ev")
    val lo = Survival.nelsonAalen(wide, col("grp0"), col("dur"), col("ev"))
      .select("lo_micro").as[Long].collect()(0)
    assert(lo == 0L, s"got $lo")
    // determinism under repartition
    assert(Survival.nelsonAalen(df.repartition(7), col("grp0"), col("dur"),
        col("ev"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2)) == got)
    intercept[IllegalArgumentException](Survival.nelsonAalen(df,
      col("grp0"), col("dur"), col("ev"), zMicro = 0L))
  }

  test("kaplanMeierLogLogCI: stated chain literals, clamp-free bounds, " +
      "S=0 NULLs (X145)") {
    import spark.implicits._
    // A: 7 subjects — events at t=1 (×2), 2, 3; censored at 2, 3, 4.
    // Trajectory: (n,d,s,gw) = (7,2,714285,57142857),
    // (5,1,571428,107142857), (3,1,380952,273809523).
    val a = Seq((1L, true), (1L, true), (2L, true), (2L, false),
      (3L, true), (3L, false), (4L, false)).map { case (t, e) => ("A", t, e) }
    // B: the whole risk set dies at t=1 — S=0, transform undefined
    val b = Seq(("B", 1L, true), ("B", 1L, true), ("B", 1L, true))
    val df = (a ++ b).toDF("grp0", "dur", "ev")
    val got = Survival.kaplanMeierLogLogCI(df, col("grp0"), col("dur"),
        col("ev"))
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got == Seq(
      ("A", 1L, 7L, 2L, 714285L, Some(710445L), Some(258154L), Some(919797L)),
      ("A", 2L, 5L, 1L, 571428L, Some(584912L), Some(171866L), Some(837082L)),
      ("A", 3L, 3L, 1L, 380952L, Some(542201L), Some(61231L), Some(716441L)),
      ("B", 1L, 3L, 3L, 0L, None, None, None)))
    // the published-form property: every band strictly inside (0, 1e6),
    // straddling S, with NO clamp anywhere in the chain
    got.filter(_._6.nonEmpty).foreach { r =>
      assert(r._7.get > 0L && r._8.get < 1000000L)
      assert(r._7.get < r._5 && r._5 < r._8.get)
    }
    // same exact S trajectory as the symmetric-band face
    val sym = Survival.kaplanMeierCI(df, col("grp0"), col("dur"), col("ev"))
      .select("grp", "t", "s_micro").as[(String, Long, Long)]
      .collect().toSet
    assert(got.map(r => (r._1, r._2, r._5)).toSet == sym)
    intercept[IllegalArgumentException](Survival.kaplanMeierLogLogCI(df,
      col("grp0"), col("dur"), col("ev"), zMicro = 0L))
  }

  test("nelsonAalenLogCI: stated chain literals, positive clamp-free " +
      "bounds, H=0 NULL (X145)") {
    import spark.implicits._
    val a = Seq((1L, true), (1L, true), (2L, true), (2L, false),
      (3L, true), (3L, false), (4L, false)).map { case (t, e) => ("A", t, e) }
    val df = a.toDF("grp0", "dur", "ev")
    val got = Survival.nelsonAalenLogCI(df, col("grp0"), col("dur"),
        col("ev"))
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sortBy(_._2)
    assert(got == Seq(
      ("A", 1L, 7L, 2L, 285714L, 40816326530L, Some(71456L), Some(1142411L)),
      ("A", 2L, 5L, 1L, 485714L, 80816326530L, Some(154235L), Some(1529600L)),
      ("A", 3L, 3L, 1L, 819047L, 191927437641L, Some(287088L), Some(2336700L))))
    // log-scale property: lower bound strictly POSITIVE, no clamp
    got.foreach(r => assert(r._7.get > 0L && r._7.get < r._5 &&
      r._5 < r._8.get))
    // same exact H/V accumulators as the symmetric-band face
    val sym = Survival.nelsonAalen(df, col("grp0"), col("dur"), col("ev"))
      .select("grp", "t", "h_micro", "var_pico")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2, r._5, r._6)).toSet == sym)
    // a floor-to-zero head step (d·1e6 DIV n = 0 needs n > 1e6): NULL
    // band, stated — one event among 1,000,001 subjects
    val big = spark.range(1000001L)
      .selectExpr("'Z' AS grp0", "CAST(1 AS LONG) AS dur", "id = 0 AS ev")
    val zrow = Survival.nelsonAalenLogCI(big, col("grp0"), col("dur"),
        col("ev"))
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(zrow == Seq(("Z", 1L, 1000001L, 1L, 0L, 0L, None, None)))
    intercept[IllegalArgumentException](Survival.nelsonAalenLogCI(df,
      col("grp0"), col("dur"), col("ev"), zMicro = 0L))
  }

  test("aalenJohansen: hand case, exact sum identity, single-cause KM " +
      "pin, guards (X174)") {
    // h: t=1 takes one subject each by cause 1 and 2 (n=4), t=2 censors
    // one, t=3 takes the last by cause 1: S(1)=5e5 (drop 5e5 split
    // 250k/250k by telescoped floors), S(3)=0 (cif1 → 750k)
    val df = Seq(("h", 1L, 1L), ("h", 1L, 2L), ("h", 2L, 0L),
      ("h", 3L, 1L)).toDF("g", "dur", "k")
    val got = Survival.aalenJohansen(df, col("g"), col("dur"), col("k"))
      .orderBy("t", "cause")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("h", 1L, 1L, 4L, 1L, 2L, 500000L, 250000L),
      ("h", 1L, 2L, 4L, 1L, 2L, 500000L, 250000L),
      ("h", 3L, 1L, 1L, 1L, 1L, 0L, 750000L)), s"got $got")
    // the construction's exact identity: at EVERY step
    // Σ_k CIF_k(t) + S(t) = 1e6 (causes seen so far)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(t: String, m: Int) = {
      val dg = md.digest(t.getBytes("UTF-8"))
      ((dg(0) & 0xff) * 256 + (dg(1) & 0xff)) % m
    }
    val rows = (1 to 200).map(i =>
      ("f", h(s"t:$i", 12).toLong, h(s"k:$i", 4).toLong))
    val out = Survival.aalenJohansen(rows.toDF("g", "dur", "k"),
        col("g"), col("dur"), col("k"))
      .orderBy("t", "cause")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val lastCif = scala.collection.mutable.Map.empty[Long, Long]
    out.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (t, stepRows) =>
      stepRows.foreach(r => lastCif(r._3) = r._8)
      assert(lastCif.values.sum + stepRows.head._7 == 1000000L,
        s"sum identity broken at t=$t")
    }
    // single-cause degeneracy: cif = 1e6 − s row for row, and s IS
    // kaplanMeier's trajectory
    val one = rows.map(r => (r._1, r._2, if (r._3 > 0) 1L else 0L))
    val aj1 = Survival.aalenJohansen(one.toDF("g", "dur", "k"),
        col("g"), col("dur"), col("k"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(aj1.nonEmpty && aj1.forall(r => r._8 == 1000000L - r._7))
    val km = Survival.kaplanMeier(
        one.map(r => (r._1, r._2, r._3 > 0)).toDF("g", "dur", "ev"),
        col("g"), col("dur"), col("ev"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._5)).toSet
    assert(aj1.map(r => (r._1, r._2, r._7)).toSet == km)
    // negative cause refuses; the cells budget refuses
    intercept[IllegalArgumentException](Survival.aalenJohansen(
      Seq(("x", 1L, -1L)).toDF("g", "dur", "k"), col("g"), col("dur"),
      col("k")))
    intercept[IllegalArgumentException](Survival.aalenJohansen(df,
      col("g"), col("dur"), col("k"), maxSteps = 2))
    // determinism under repartition
    assert(Survival.aalenJohansen(
      rows.toDF("g", "dur", "k").repartition(7), col("g"), col("dur"),
      col("k"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet == out.toSet)
  }
}
