package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new Timestamp(sec * 1000L)

  test("transitions: hand-pinned pairs, per-user isolation, floor micros (X87)") {
    val ev = Seq(
      (1L, at(1), "a"), (1L, at(2), "b"), (1L, at(3), "a"), (1L, at(4), "b"),
      (2L, at(1), "a"), (2L, at(2), "a"),
      // user boundary: no transition from u1's last to u2's first
      (3L, at(5), "c")) // single event: no transitions at all
      .toDF("u", "t", "s")
    val out = Markov.transitions(ev, col("u"), col("t"), col("s"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 2L, 666666L), // a: 2 of 3 outgoing
      ("b", "a", 1L, 1000000L),
      ("a", "a", 1L, 333333L)), s"got $out")
    // NULL state/user/ts rows drop
    val n = Markov.transitions(
      Seq((Some(1L), Some(at(1)), Some("a")), (Some(1L), Some(at(2)), None),
        (Some(1L), Some(at(3)), Some("b"))).toDF("u", "t", "s"),
      col("u"), col("t"), col("s"))
      .as[(String, String, Long, Long)].collect().toSet
    // the NULL row vanishes entirely: a→b is the one adjacency left
    assert(n == Set(("a", "b", 1L, 1000000L)), s"got $n")
  }

  test("stationary: 2-state chain lands on the analytic fixed point") {
    // P = [[0, 1], [0.5, 0.5]] → π = (1/3, 2/3)
    val tr = Seq(("a", "b", 2L, 1000000L),
      ("b", "a", 1L, 500000L), ("b", "b", 1L, 500000L))
      .toDF("prev_state", "next_state", "n", "p_micro")
    val pi = Markov.stationary(tr, rounds = 30)
      .as[(String, Long)].collect().toMap
    assert(math.abs(pi("a") - 333333L) <= 5, s"got $pi")
    assert(math.abs(pi("b") - 666666L) <= 5, s"got $pi")
    // independent fixed-point replica of the exact trajectory arithmetic
    var p = Array(1000000L / 2, 1000000L / 2)
    val m = Array(Array(0L, 1000000L), Array(500000L, 500000L))
    for (_ <- 1 to 30) {
      val raw = Array.tabulate(2)(j => (p(0) * m(0)(j) + p(1) * m(1)(j)) / 1000000L)
      val t = raw.sum
      p = raw.map(_ * 1000000L / t)
    }
    assert(pi("a") == p(0) && pi("b") == p(1), s"trajectory diverged: $pi vs ${p.toSeq}")
  }

  test("stationary: leaking states refused; cardinality guard; determinism") {
    val leak = Seq(("a", "b", 1L, 1000000L))
      .toDF("prev_state", "next_state", "n", "p_micro")
    val e = intercept[IllegalArgumentException](Markov.stationary(leak))
    assert(e.getMessage.contains("no outgoing"))
    val tr = Seq(("a", "b", 1L, 1000000L), ("b", "a", 1L, 1000000L))
      .toDF("prev_state", "next_state", "n", "p_micro")
    intercept[IllegalArgumentException](
      Markov.stationary(tr, maxStates = 1))
    intercept[IllegalArgumentException](Markov.stationary(tr, rounds = 0))
    // end-to-end determinism under repartition
    val ev = (1 to 60).map(i =>
      (i % 5L, at(i.toLong), Seq("a", "b", "c")(i % 3))).toDF("u", "t", "s")
    val t1 = Markov.transitions(ev, col("u"), col("t"), col("s"))
    val t2 = Markov.transitions(ev.repartition(7), col("u"), col("t"), col("s"))
    assert(t1.orderBy("prev_state", "next_state").collect().toSeq ==
      t2.orderBy("prev_state", "next_state").collect().toSeq)
    assert(Markov.stationary(t1, rounds = 4).orderBy("state").collect().toSeq ==
      Markov.stationary(t2, rounds = 4).orderBy("state").collect().toSeq)
  }
}
