package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  test("electCanonical: rule order, NULLs lose, deterministic tie-break (X103)") {
    val df = Seq(
      (1L, 10L, Some(5L), "x"), (1L, 11L, None, "y"), (1L, 12L, Some(5L), "z"),
      (2L, 20L, None, "p")).toDF("cl", "id", "score", "payload")
    val got = Survivorship.electCanonical(df, col("cl"),
        Seq(col("score")), col("id"))
      .orderBy("cl")
      .as[(Long, Long, Option[Long], String)].collect().toSeq
    // cluster 1: score 5 ties between ids 10 and 12 → lower id wins; the
    // NULL-scored row loses to any present score. cluster 2: only row wins
    assert(got == Seq((1L, 10L, Some(5L), "x"), (2L, 20L, None, "p")),
      s"got $got")
    // a second rule breaks the first rule's ties before the tie-break
    val two = Survivorship.electCanonical(df, col("cl"),
        Seq(col("score"), col("payload")), col("id"))
      .filter(col("cl") === 1).select("id").as[Long].collect()(0)
    assert(two == 12L) // payload "z" > "x" among the score-5 ties
    // NULL clusters drop; guards
    assert(Survivorship.electCanonical(
      Seq((Option.empty[Long], 1L)).toDF("cl", "id"), col("cl"),
      Seq(col("id")), col("id")).count() == 0)
    intercept[IllegalArgumentException](
      Survivorship.electCanonical(df, col("cl"), Nil, col("id")))
  }

  test("surviveFields: last non-NULL per field, never un-fills (X103)") {
    val df = Seq(
      (1L, 1L, Option.empty[String], Some("a")),
      (1L, 2L, Some("x"), Option.empty[String]),
      (1L, 3L, Option.empty[String], Some("b")),
      (2L, 1L, Option.empty[String], Option.empty[String]))
      .toDF("cl", "ts", "f", "g")
    val got = Survivorship.surviveFields(df, col("cl"), col("ts"),
        col("ts"), Seq("f", "g"))
      .orderBy("cluster_id")
      .as[(Long, Long, Option[String], Option[String])].collect().toSeq
    // f: only ts=2 carries a value → "x" survives past later NULLs;
    // g: latest non-NULL is ts=3's "b"; all-NULL stays NULL
    assert(got == Seq((1L, 3L, Some("x"), Some("b")),
      (2L, 1L, None, None)), s"got $got")
    // determinism + guards
    assert(Survivorship.surviveFields(df.repartition(5), col("cl"),
        col("ts"), col("ts"), Seq("f", "g")).orderBy("cluster_id")
      .as[(Long, Long, Option[String], Option[String])]
      .collect().toSeq == got)
    intercept[IllegalArgumentException](Survivorship.surviveFields(
      df, col("cl"), col("ts"), col("ts"), Seq("missing")))
    intercept[IllegalArgumentException](Survivorship.surviveFields(
      df, col("cl"), col("ts"), col("ts"), Nil))
  }
}
