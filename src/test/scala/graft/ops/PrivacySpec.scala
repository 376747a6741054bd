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

  test("audit and suppression are one shuffle each (no join, no rescan)") {
    val auditPlan = Privacy.kAnonymityAudit(people, Seq("city"), 2)
      .queryExecution.executedPlan.toString
    assert(!auditPlan.contains("Join"), s"audit joined:\n$auditPlan")
    val supPlan = Privacy.suppressBelowK(people, Seq("city"), 2)
      .queryExecution.executedPlan.toString
    assert(!supPlan.contains("Join"), s"suppression joined:\n$supPlan")
  }
}
