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

  /** The k smallest DISTINCT Long values of a group — the KMV
    * (k-minimum-values) distinct sketch's aggregation kernel
    * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 for the union/Jaccard
    * estimators built on it). The buffer is one sorted array of ≤ k longs
    * per (partition, group) regardless of group size: a billion hashed keys
    * collapse map-side into k·8 bytes before anything shuffles. min-k of
    * distinct values is commutative/associative/idempotent, so partial and
    * final aggregation commute and re-aggregating sketch rows IS the
    * sketch of the union — the mergeability contract the other sketch
    * operators (HLL, KLL, CMS) already keep.
    *
    * Deterministic: output depends only on the SET of inputs, never on
    * partitioning or arrival order — exactly replayable by an external
    * engine's `ORDER BY hash LIMIT k` over distinct keys. */
  final class MinKDistinct(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], in: Long): Array[Long] = insert(b, in)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var r = a
      var i = 0
      while (i < b.length) { r = insert(r, b(i)); i += 1 }
      r
    }
    // sorted-ascending distinct insert, capped at k — O(log k) search +
    // O(k) shift, on a ≤ k-element array (k is 64-ish; never group-sized)
    private def insert(b: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(b, h)
      if (idx >= 0) b // already present: idempotent
      else {
        val ins = -idx - 1
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins == k) b // larger than the current k-th minimum
        else {
          // shift (ins, k-1] right by one in place, dropping the old max
          System.arraycopy(b, ins, b, ins + 1, k - ins - 1)
          b(ins) = h
          b
        }
      }
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
