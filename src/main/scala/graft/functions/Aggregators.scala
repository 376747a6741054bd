package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.8): the `Aggregator[IN, BUF, OUT]`
  * path for aggregation semantics the built-ins lack. Aggregators run as
  * proper partial+final aggregation (map-side combine, mergeable buffers),
  * so they scale exactly like built-in aggregates — the buffer, not the
  * group's rows, is what shuffles.
  */
object Aggregators {

  /** Weighted arithmetic mean: Σ(w·x) / Σ(w). The standard example of state
    * that `avg` can't express; buffer is two doubles regardless of group
    * size. Usage: `df.groupBy(...).agg(udaf(WeightedMean)($"x", $"w"))` or
    * register with `spark.udf.register("wmean", udaf(WeightedMean))`. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
