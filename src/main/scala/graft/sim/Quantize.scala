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

  /** Binary (sign-bit) quantization: a `dim`-float vector → ⌈dim/64⌉ packed
    * 64-bit words (bit = 1 iff component ≥ 0) — 32× less shuffle/disk than
    * float32, the compression behind binary-embedding retrieval at corpus
    * scale. Hamming distance between sign codes approximates angular
    * distance (each sign bit is a fixed-hyperplane LSH bit, so collision
    * probability is 1 − θ/π per Goemans-Williamson); the standard pipeline
    * generates candidates with [[hamming]] over the codes and re-ranks the
    * survivors with exact [[graft.functions.CosineSimilarity]] on floats.
    * Map-only, fuses into the scan. Bits pack MSB-first per word; a final
    * partial word keeps its bits in the LOW positions — consistent across
    * vectors of the same `dim`, which is all Hamming needs. NaN packs as 1:
    * Spark SQL orders NaN larger than every number (so NaN ≥ 0 is TRUE) and
    * DuckDB does the same — the two engines agree, and one bad component
    * costs one bit, never the whole code. A NULL component packs as 0 (same
    * one-bit blast radius); a vector whose length ≠ `dim` nulls the WHOLE
    * code — its bits would sit misaligned against full-length codes, making
    * every distance silently wrong — and [[hammingTopK]] sorts null codes
    * last so they can never displace a real neighbor. */
  def binarySign(vec: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    val nWords = (dim + 63) / 64
    val words = (0 until nWords).map { w =>
      val len = math.min(64, dim - w * 64)
      aggregate(slice(vec, lit(w * 64 + 1), lit(len)), lit(0L),
        // a NULL component packs as 0 (null >= 0 is null → otherwise
        // branch) — one missing value costs one bit, documented below
        (acc, x) => shiftleft(acc, 1)
          .bitwiseOR(when(x >= 0, lit(1L)).otherwise(lit(0L))))
    }
    // a vector of the WRONG length would pack fewer shifts and leave every
    // bit misaligned against full-length codes — structurally wrong Hamming
    // distances with no error anywhere. Null the code instead (the
    // quantizeInt8 bad-vector convention); hammingTopK sorts nulls last.
    when(size(vec) === dim, array(words: _*))
  }

  /** Hamming distance between two packed sign-code arrays: popcount of the
    * per-word XOR, summed — pure codegen'd integer ops, the cheapest
    * distance there is. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)

  /** Brute-force Hamming top-k of every corpus code against one query code
    * (a 1-row frame): broadcast the query, map-only distance, bounded-heap
    * top-k (`TakeOrderedAndProject`) — no shuffle of the corpus, no global
    * sort. Ties break on `id` so the result is deterministic. At larger k·N
    * this is the candidate stage; re-rank survivors with exact cosine. */
  def hammingTopK(codes: DataFrame, id: String, codeCol: String,
      query: DataFrame, queryCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    codes.crossJoin(broadcast(query))
      .select(col(id), hamming(col(codeCol), col(queryCol)).as("hamming"))
      // nulls LAST: Spark's ASC default is nulls-first, which would rank a
      // null code (null/corrupt vector) as the NEAREST neighbor and push a
      // true neighbor out of the top-k — and diverge from SQL engines that
      // default nulls-last
      .orderBy(col("hamming").asc_nulls_last, col(id))
      .limit(k)
  }
}
