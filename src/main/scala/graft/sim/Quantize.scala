package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns (X3 scale path): 4× less
  * memory/shuffle/disk than float32 for ANN workloads, at a reconstruction
  * error bounded by scale/2 per component — the standard first compression
  * step before IVF/LSH indexing (product quantization is the heavier
  * follow-on; symmetric scalar int8 is what vector stores default to).
  *
  * Symmetric per-vector scaling: `scale = max|x| / 127`, `q = round(x /
  * scale)` as `tinyint`. Per-VECTOR (not per-corpus) scales are map-only —
  * no corpus-wide max reduction, no shuffle, and outlier vectors cannot
  * crush everyone else's resolution.
  *
  * Codegen notes: the scale lands in its OWN column first and the quantize
  * lambda references that attribute — referencing the max-abs aggregate
  * subtree inside the transform lambda would re-evaluate it per element
  * (O(d²) per vector, the documented HOF outer-reference trap). */
object Quantize {

  /** Add `scaleCol` (double) and `qCol` (array<tinyint>) alongside `vec`.
    * Null vectors yield null scale/qvec; a zero vector quantizes to zeros
    * with scale 0 (dequantize returns exact zeros). */
  def quantizeInt8(df: DataFrame, vec: String, qCol: String = "qvec",
      scaleCol: String = "scale"): DataFrame = {
    require(!df.columns.contains(qCol) && !df.columns.contains(scaleCol),
      s"output column $qCol/$scaleCol already exists; pass different names")
    df.withColumn(scaleCol,
        aggregate(col(vec), lit(0.0), (a, x) => greatest(a, abs(x.cast("double"))))
          / 127.0)
      .withColumn(qCol,
        when(col(scaleCol) === 0.0,
          transform(col(vec), _ => lit(0).cast("tinyint")))
        // a NaN element makes the max (greatest treats NaN as largest) and an
        // ±Inf element makes scale infinite: null qvec, like a null vector —
        // the alternative is an ANSI cast error killing the task (NaN) or a
        // silent all-zeros quantization (Inf). One bad vector must not take
        // down a 100 TB pass.
        .when(isnan(col(scaleCol)) || col(scaleCol) === Double.PositiveInfinity,
          lit(null).cast("array<tinyint>"))
        .otherwise(
          transform(col(vec), x =>
            round(x.cast("double") / col(scaleCol)).cast("tinyint"))))
  }

  /** Reconstruct `array<double>` from (qvec, scale). Error per component is
    * at most scale/2 (round-to-nearest), the bound QuantizeSpec pins. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
