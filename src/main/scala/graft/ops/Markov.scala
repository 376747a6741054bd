package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X87 — Markov event-flow analysis: the "user paths" primitive behind
  * every product-analytics flow report (and the behavioral fingerprint
  * bot-detection pipelines threshold): consecutive event pairs per user
  * become a first-order transition matrix, and its stationary
  * distribution says where the process spends its time in the long run —
  * the PageRank idea applied to behavior instead of links (X32 is the
  * same power method on a graph; here the matrix is row-stochastic by
  * construction).
  *
  * Determinism contract: transitions order each user's events by
  * (ts, state) — same-instant same-state duplicates are interchangeable
  * (multiset-stable under whichever adjacency `lag` picks), same-instant
  * DIFFERENT states order by state ascending (documented arbitrariness;
  * simultaneous events have no causal order to recover). Probabilities
  * are `n·1e6 DIV row_total` floor micros. The stationary iteration runs
  * in fixed-point micros with floor renormalization per round (the X71
  * trajectory rules: non-negative dividends everywhere, deficit < S µ),
  * so an external engine replays the WHOLE power trajectory exactly —
  * no eigensolver, no float accumulation.
  *
  * Scale shape: transitions are one user-keyed window (`lag`) + one
  * (prev, next)-keyed aggregation with map-side combine — the S²-row
  * matrix is configuration-sized, never corpus-sized. The power loop
  * runs DRIVER-side on the collected matrix (`maxStates` refuses a
  * state column with key-like cardinality — the [[Sampling
  * .doremiMixture]] stance); each round is S² integer
  * multiply-accumulates. Cross-gap transitions count like any other —
  * sessionize upstream ([[TimeSeries.assembleSessions]]) when flows
  * must not span gaps. */
object Markov {

  /** Consecutive-pair transition counts and row-normalized probabilities:
    * `(prev_state, next_state, n, p_micro)`. NULL users, timestamps, and
    * states are dropped (no defined position in any flow). */
  def transitions(events: DataFrame, user: Column, ts: Column,
      state: Column): DataFrame = {
    val ev = events.select(user.as("__u"), ts.as("__ts"),
        state.cast("string").as("__s"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull &&
        col("__s").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__ts"), col("__s"))
    val pairs = ev
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull)
    val counts = pairs.groupBy(col("__prev").as("prev_state"),
        col("__s").as("next_state"))
      .agg(count(lit(1)).as("n"))
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy("prev_state")
    counts
      .withColumn("__rt", sum(col("n")).over(w2))
      .withColumn("p_micro", expr("n * 1000000 DIV __rt"))
      .drop("__rt")
  }

  /** Stationary distribution of the [[transitions]] matrix by `rounds`
    * fixed-point power iterations from the uniform start:
    * `(state, pi_micro)`. States appearing only as a flow's LAST event
    * have no outgoing row; their probability mass would leak, so such
    * absorbing-in-the-data states are REFUSED — pass flows whose state
    * universe is closed (product flows loop; add an explicit terminal
    * state that self-loops when yours do not). */
  def stationary(transitions: DataFrame, rounds: Int = 8,
      maxStates: Int = 100): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1,50], got $rounds")
    require(maxStates >= 1, s"maxStates must be positive, got $maxStates")
    val rows = transitions
      .select(col("prev_state").cast("string"),
        col("next_state").cast("string"), col("p_micro").cast("long"))
      .limit(maxStates * maxStates + 1).collect()
    require(rows.length <= maxStates * maxStates,
      s"more than $maxStates² transition rows — a state column with " +
        "key-like cardinality is an id, not a flow state")
    val states = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    val noOut = states.toSet -- rows.map(_.getString(0)).toSet
    require(noOut.isEmpty,
      s"state(s) ${noOut.toSeq.sorted.mkString(", ")} have no outgoing " +
        "transitions — mass would leak; close the flow with a terminal " +
        "self-loop upstream")
    val idx = states.zipWithIndex.toMap
    val s = states.length
    val p = Array.ofDim[Long](s, s)
    rows.foreach(r => p(idx(r.getString(0)))(idx(r.getString(1))) =
      r.getLong(2))
    var pi = Array.fill(s)(1000000L / s)
    for (_ <- 1 to rounds) {
      val raw = Array.tabulate(s) { j =>
        var acc = 0L
        var i = 0
        while (i < s) { acc += pi(i) * p(i)(j); i += 1 }
        acc / 1000000L
      }
      val tot = raw.sum
      require(tot > 0, "stationary: all mass floored away — more rounds " +
        "than the micro resolution supports for this state count")
      pi = raw.map(r => r * 1000000L / tot)
    }
    val spark = transitions.sparkSession
    import spark.implicits._
    states.zip(pi).toSeq.toDF("state", "pi_micro")
  }
}
