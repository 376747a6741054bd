package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    // (id, city, band) — (a, 1) has 3 members, (a, 2) has 1, (b, 1) has 2,
    // (null, 1) has 2 — nulls group together
    (1L, Some("a"), 1), (2L, Some("a"), 1), (3L, Some("a"), 1),
    (4L, Some("a"), 2),
    (5L, Some("b"), 1), (6L, Some("b"), 1),
    (7L, None: Option[String], 1), (8L, None: Option[String], 1)
  ).toDF("id", "city", "band")

  test("kAnonymityAudit: group sizes, k flag, nulls are their own group") {
    val audit = Privacy.kAnonymityAudit(people, Seq("city", "band"), k = 2)
      .orderBy(asc_nulls_last("city"), asc("band"))
      .collect()
    assert(audit.map(r => (Option(r.getString(0)), r.getInt(1),
      r.getLong(2), r.getBoolean(3))).toSeq == Seq(
      (Some("a"), 1, 3L, true),
      (Some("a"), 2, 1L, false),
      (Some("b"), 1, 2L, true),
      (None, 1, 2L, true)))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityAudit(people, Seq("city"), k = 1))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityAudit(people, Seq("nope"), k = 2))
  }

  test("suppressBelowK keeps exactly the >=k groups, rows intact") {
    val kept = Privacy.suppressBelowK(people, Seq("city", "band"), k = 2)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L))
    assert(kept.columns.toSeq == people.columns.toSeq)
    // the output is k-anonymous on the QIs by construction
    val re = Privacy.kAnonymityAudit(kept, Seq("city", "band"), k = 2)
    assert(re.filter(!col("k_anonymous")).isEmpty)
    intercept[IllegalArgumentException](Privacy.suppressBelowK(
      people.withColumn("__qi_n", lit(1)), Seq("city"), k = 2))
  }

  test("dpNoisyCounts: noise replays the md5 inverse-CDF exactly") {
    val out = Privacy.dpNoisyCounts(people, col("city"), epsilon = 0.5,
      seed = "sP").orderBy(asc_nulls_last("grp")).collect()
    // independent replay of the contract: u from md5("sP:" + grp),
    // Laplace(1/eps) via inverse CDF, rounded to 6
    def expected(grp: Option[String], n: Long): Double = {
      val key = grp.getOrElse(" null")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"sP:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val c = u - 0.5
      val noise = -(1.0 / 0.5) * math.signum(c) * math.log(1 - 2 * math.abs(c))
      BigDecimal(n + noise).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq(
        (Some("a"), 4L, expected(Some("a"), 4)),
        (Some("b"), 2L, expected(Some("b"), 2)),
        (None, 2L, expected(None, 2))))
    // the NULL group got REAL noise, not a NULL that leaks its count
    assert(!out.last.isNullAt(2))
    // determinism: same seed, same release
    val again = Privacy.dpNoisyCounts(people, col("city"), 0.5, "sP")
      .orderBy(asc_nulls_last("grp")).collect()
    assert(again.toSeq == out.toSeq)
    // a rotated seed draws different noise (budget spend is explicit)
    val rotated = Privacy.dpNoisyCounts(people, col("city"), 0.5, "sQ")
      .orderBy(asc_nulls_last("grp")).collect()
    assert(rotated.map(_.getDouble(2)).toSeq != out.map(_.getDouble(2)).toSeq)
    intercept[IllegalArgumentException](
      Privacy.dpNoisyCounts(people, col("city"), epsilon = 0.0, seed = "sP"))
    // the seed is the privacy key — an empty one is refused outright
    intercept[IllegalArgumentException](
      Privacy.dpNoisyCounts(people, col("city"), epsilon = 0.5, seed = ""))
  }

  // ladder fixture: 8 rows over (city, age); k=2. Level 0 leaves three
  // singletons; widening age to decades saves two of them; dropping city
  // saves the third.
  private def ladderRows = {
    import spark.implicits._
    Seq(("a", 21, 1), ("a", 23, 2), ("a", 29, 3), ("b", 30, 4),
      ("b", 31, 5), ("b", 47, 6), ("c", 52, 7), ("c", 58, 8))
      .toDF("city", "age", "pid")
  }
  private def ladder = Seq(
    Seq("city" -> col("city"), "age" -> col("age")),
    Seq("city" -> col("city"), "age" -> floor(col("age") / 10)),
    Seq("city" -> lit("*"), "age" -> floor(col("age") / 10)))

  test("ladderAudit: one row per level, suppression falls as the ladder coarsens") {
    val audit = Privacy.ladderAudit(ladderRows, ladder, k = 2)
      .orderBy("level")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // L0: every (city, age) pair is unique -> all 8 rows suppressed;
    // L1: (a,2x)=3, (b,3x)=2, (b,4x)=1, (c,5x)=2 -> one singleton left;
    // L2: (*,2x)=3, (*,3x)=2, (*,4x)=1, (*,5x)=2 -> widening city alone
    //     cannot save the lone 40s row
    assert(audit == Seq((0, 8L, 8L), (1, 1L, 1L), (2, 1L, 1L)))
    // and the ONE-scan shape: a single audit never re-scans per level
    val plan = Privacy.ladderAudit(ladderRows, ladder, k = 2)
      .queryExecution.executedPlan.toString
    assert("Generate explode".r.findAllIn(plan).size == 1, plan)
    intercept[IllegalArgumentException](
      Privacy.ladderAudit(ladderRows, Seq.empty, k = 2))
    intercept[IllegalArgumentException](Privacy.ladderAudit(ladderRows,
      Seq(Seq("city" -> col("city")), Seq.empty), k = 2))
  }

  test("generalizeUntilK: picks the least-suppression level, lowest on ties") {
    val out = Privacy.generalizeUntilK(ladderRows, ladder, k = 2)
    // L1 and L2 tie at 1 suppressed row -> the LESS generalized L1 wins
    assert(out.select("gen_level").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(1))
    val released = out.orderBy("pid")
      .collect().map(r => (r.getAs[String]("city"), r.getAs[Long]("age"),
        r.getAs[Int]("pid"))).toSeq
    // the lone 40s row is suppressed; everyone else releases with decade age
    assert(released == Seq(("a", 2L, 1), ("a", 2L, 2), ("a", 2L, 3),
      ("b", 3L, 4), ("b", 3L, 5), ("c", 5L, 7), ("c", 5L, 8)))
    // the release IS k-anonymous on the coarsened QIs
    val sizes = out.groupBy("city", "age").count()
      .select("count").collect().map(_.getLong(0))
    assert(sizes.forall(_ >= 2))
    // a ladder whose level 0 already satisfies k never generalizes
    val ok = Privacy.generalizeUntilK(
      ladderRows.withColumn("age", lit(1)), ladder, k = 2)
    assert(ok.select("gen_level").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(0))
  }

  test("dpQuantiles: exponential mechanism via Gumbel-max, replayed independently (X74)") {
    import spark.implicits._
    // values 1..100 each once; median target rank ⌊99·0.5⌋ = 49 → value 50
    val vals = (1 to 100).map(_.toDouble).toDF("x")
    val eps = 4000000L // ε = 4: utility gap 2.0/rank vs Gumbel σ≈1.28
    val got = Privacy.dpQuantiles(vals, col("x"), Seq(500000L), eps, "t")
      .as[(Long, Double)].collect().toSeq
    assert(got.size == 1 && got.head._1 == 500000L)
    // independent replica of the whole mechanism: md5-Gumbel per rank,
    // penalty ε·|below − 49|/2 micros, argmax with value tie-break
    val md = java.security.MessageDigest.getInstance("MD5")
    def pri(below: Long): Double = {
      md.reset()
      val hex = md.digest(s"t:500000:$below".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val pen = (eps * math.abs(below - 49L)) / 2L
      -pen.toDouble / 1e6 - math.log(-math.log(u))
    }
    val expect = (0L until 100L).maxBy(b => (pri(b), -b))
    assert(got.head._2 == expect + 1.0,
      s"mechanism drift: released ${got.head._2}, replica says ${expect + 1}")
    // determinism under re-partitioning; seed rotation changes the draw
    val again = Privacy.dpQuantiles(vals.repartition(7), col("x"),
      Seq(500000L), eps, "t").as[(Long, Double)].collect().toSeq
    assert(again == got)
    val rotated = (1 to 50).map(s =>
      Privacy.dpQuantiles(vals, col("x"), Seq(500000L), eps, s"r$s")
        .as[(Long, Double)].collect().head._2).distinct
    assert(rotated.size > 1, "every seed released the identical value")
    // utility: at ε = 4 the release concentrates near the true median
    assert(math.abs(got.head._2 - 50.0) <= 5, s"released ${got.head._2}")
    // guards
    intercept[IllegalArgumentException](
      Privacy.dpQuantiles(vals, col("x"), Nil, eps, "t"))
    intercept[IllegalArgumentException](
      Privacy.dpQuantiles(vals, col("x"), Seq(2000000L), eps, "t"))
    intercept[IllegalArgumentException](
      Privacy.dpQuantiles(vals, col("x"), Seq(500000L, 500000L), eps, "t"))
    intercept[IllegalArgumentException](
      Privacy.dpQuantiles(vals, col("x"), Seq(500000L), 0L, "t"))
    intercept[IllegalArgumentException](
      Privacy.dpQuantiles(vals, col("x"), Seq(500000L), eps, ""))
  }

  test("audit and suppression are one shuffle each (no join, no rescan)") {
    val auditPlan = Privacy.kAnonymityAudit(people, Seq("city"), 2)
      .queryExecution.executedPlan.toString
    assert(!auditPlan.contains("Join"), s"audit joined:\n$auditPlan")
    val supPlan = Privacy.suppressBelowK(people, Seq("city"), 2)
      .queryExecution.executedPlan.toString
    assert(!supPlan.contains("Join"), s"suppression joined:\n$supPlan")
  }
}
