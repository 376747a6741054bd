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

  /** Elementwise sum of fixed-length Long vectors — the aggregation kernel
    * behind per-group embedding centroids. The buffer is ONE Array[Long] of
    * length `dim` per (partition, group) regardless of group size: partial
    * aggregation collapses a billion member vectors into `dim` longs before
    * anything shuffles, which is what makes a 100 TB per-label centroid a
    * map-side-combine job rather than a vector shuffle.
    *
    * Inputs are expected fixed-point-quantized (e.g. floor(x·10⁶) of a
    * float component): Long addition is exact and order-independent, so the
    * result is identical on every run, partitioning, and engine — the
    * float-aggregation portability rule (Ops.sumDec) extended to vectors.
    * For a plain double-precision mean, divide the finished sums by the
    * group count and scale back. Null vectors are ignored (contribute
    * nothing, like built-in aggregates); a wrong-length vector fails fast. */
  final class VectorSumLong(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(dim > 0, s"dim must be positive, got $dim")
    override def zero: Array[Long] = new Array[Long](dim)
    override def reduce(b: Array[Long], in: Seq[Long]): Array[Long] = {
      if (in != null) {
        require(in.length == dim, s"expected $dim components, got ${in.length}")
        var i = 0
        while (i < dim) { b(i) += in(i); i += 1 }
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
