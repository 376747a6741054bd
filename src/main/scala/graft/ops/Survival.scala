package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X104 — Kaplan-Meier survival curves (Kaplan & Meier, JASA 1958): the
  * time-to-event primitive behind churn/retention-duration analysis with
  * RIGHT-CENSORED subjects — users still active at observation end have
  * not churned YET, and simply dropping them biases every naive
  * "average lifetime" low. KM handles censoring by construction: at each
  * distinct event time t with n subjects still at risk and d events,
  * survival multiplies by (n − d)/n; censored subjects leave the risk
  * set without contributing an event.
  *
  * Exact fixed-point contract (the X71/X87 trajectory rules): survival
  * runs in integer micros with a FLOOR at every step —
  * S_i = S_{i−1}·(n_i − d_i) DIV n_i, S_0 = 1e6 — all operands
  * non-negative, so any engine replays the whole trajectory
  * bit-for-bit (a recursive CTE in SQL); no float product, no
  * exp(Σlog) drift. Durations must be non-negative integers in the
  * caller's unit (days, hours — bucket upstream; sub-unit ties ARE ties,
  * the standard KM discretization).
  *
  * Scale shape: one (group, t)-keyed aggregation with map-side combine
  * (events + at-risk totals), ONE keyed window for the risk-set counts
  * (cumulative departures — a group's sort is bounded by its distinct
  * DURATIONS, not its subjects), then the sequential floor-product folds
  * DRIVER-side over the step table — which is (groups × distinct event
  * times)-sized, never subject-sized; `maxSteps` refuses a duration
  * column with key-like cardinality (the [[Markov.stationary]] bounded-
  * collect stance: pass bucketed durations, not raw micros). */
object Survival {

  /** One row per (group, event time): `(grp, t, n_risk, d_events,
    * s_micro)` — survival AFTER the deaths at `t`. NULL groups form the
    * real group "(null)" (the X88 stance); NULL durations/events drop. */
  def kaplanMeier(df: DataFrame, group: Column, duration: Column,
      event: Column, maxSteps: Int = 100000): DataFrame = {
    require(maxSteps >= 1, s"maxSteps must be positive, got $maxSteps")
    val base = df.select(
        coalesce(group.cast("string"), lit("(null)")).as("__g"),
        duration.cast("long").as("__t"), event.cast("boolean").as("__e"))
      .filter(col("__t").isNotNull && col("__e").isNotNull)
    val neg = base.filter(col("__t") < 0).limit(1).collect()
    require(neg.isEmpty,
      "kaplanMeier: negative duration — time-to-event is an elapsed " +
        "span; fix the construction upstream")
    val perT = base.groupBy(col("__g"), col("__t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        count(lit(1)).as("__all"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__g").orderBy("__t")
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("__g")
    val steps = perT
      .withColumn("__before", coalesce(sum(col("__all"))
        .over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("__n", sum(col("__all")).over(wg) - col("__before"))
      .filter(col("__d") > 0) // KM steps exist only where events happened
      .select(col("__g"), col("__t"), col("__n"), col("__d"))
    val rows = steps.orderBy("__g", "__t").limit(maxSteps + 1).collect()
    require(rows.length <= maxSteps,
      s"more than $maxSteps KM steps — a duration column with key-like " +
        "cardinality is raw time, not a bucketed span; bucket upstream")
    val out = Vector.newBuilder[(String, Long, Long, Long, Long)]
    var curG: String = null
    var s = 1000000L
    rows.foreach { r =>
      val g = r.getString(0)
      if (g != curG) { curG = g; s = 1000000L }
      val n = r.getLong(2); val d = r.getLong(3)
      s = s * (n - d) / n // non-negative floor, engine-replayable
      out += ((g, r.getLong(1), n, d, s))
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.result().toDF("grp", "t", "n_risk", "d_events", "s_micro")
  }
}
