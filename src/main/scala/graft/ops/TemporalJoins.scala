package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the training-data pipeline needs but the
  * reference's Postgres surface only reaches through hand-written SQL:
  * point-in-time (as-of) joins and binned range joins. Both are composed
  * from existing Catalyst operators — no custom physical plan needed —
  * with shapes chosen so nothing degenerates to a cross product.
  */
object TemporalJoins {

  /** AS-OF (point-in-time) join: for every left row, attach the payload of
    * the LATEST right row with the same keys and `rightTs <= leftTs`
    * (backward as-of; `strict = true` uses `<`). The standard
    * feature-lookup shape: "the user's most recent state at event time" —
    * leakage-free by construction, since only past right rows can match.
    *
    * Plan shape: tag both sides, union, ONE keyed window over
    * (ts, side-order) carrying `last(payload, ignoreNulls)` forward, filter
    * back to left rows. A single shuffle on `keys`; per-key work is a sort
    * — no per-pair candidate blowup, no range cross product. At equal
    * timestamps the right row sorts before (inclusive) or after (strict)
    * the left row, which is exactly the tie semantics; right rows must be
    * unique per (keys, ts) for a deterministic result (dedupe upstream —
    * two states at the same instant is a data bug, not a join concern).
    *
    * Output: every left column, plus the right payload columns (null where
    * no right row precedes). Payload names must not collide with left's. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      strict: Boolean = false): DataFrame = {
    val leftData = left.columns.toSeq.filterNot(keys.contains)
    val payload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    require(payload.nonEmpty, "right side has no payload columns besides keys and ts")
    // same reserved-name guard as rangeJoin's __bin: a pre-existing __ts/
    // __side/__pl would produce duplicate columns and a confusing
    // AnalysisException (or a wrong selection) mid-query
    val reserved = Seq("__ts", "__side", "__pl")
      .filter(r => left.columns.contains(r) || right.columns.contains(r))
    require(reserved.isEmpty, s"${reserved.mkString(", ")} reserved by asofJoin")
    val collisions = leftData.toSet.intersect(payload.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")}")

    val sideLeft = if (strict) 0 else 1 // right sorts first at equal ts iff inclusive
    val sideRight = 1 - sideLeft
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // The payload travels as ONE struct per right row, so `last(ignoreNulls)`
    // skips only the left rows' placeholder nulls — never a right row whose
    // payload VALUE is null. Carrying columns individually would silently
    // substitute an older row's value for a genuine null (and could stitch
    // different payload columns from different right rows).
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => payload.contains(f.name)))

    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(sideLeft).as("__side"),
          lit(null).cast(payloadType).as("__pl")) ++
        leftData.map(col): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(sideRight).as("__side"),
          payloadStruct.as("__pl")) ++
        leftData.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        keys.map(col) ++
          Seq(col("__side"), last(col("__pl"), ignoreNulls = true).over(w).as("__pl")) ++
          leftData.map(col): _*)
      .filter(col("__side") === sideLeft)
      .select(left.columns.toIndexedSeq.map(col) ++ payload.map(c => col(s"__pl.$c").as(c)): _*)
  }

  /** Binned RANGE join: all (left, right) pairs with the same keys and
    * `left.point` inside `[right.rangeStart, right.rangeEnd]`. The naive
    * formulation is a non-equi join — a broadcast nested loop at any size.
    * Here each right interval explodes into the coarse bins it overlaps and
    * each left point maps to its one bin, so the join is EQUI on
    * (keys, bin) and the exact range predicate filters the survivors:
    * candidate volume is governed by intervals-per-bin, never |L|×|R|.
    * `binWidth` is in the point column's units (e.g. seconds for epoch
    * timestamps); choose it near the typical interval length so intervals
    * explode into O(1) bins. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      point: String,
      rangeStart: String,
      rangeEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // non-key column collisions make the post-join range filter ambiguous;
    // fail at declaration time, not with an AnalysisException mid-query
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keys.toSet
    require(collisions.isEmpty,
      s"left/right non-key columns collide: ${collisions.mkString(", ")}")
    require(!(left.columns ++ right.columns).contains("__bin"),
      "__bin is reserved by rangeJoin")
    val lBinned = left.withColumn("__bin",
      floor(col(point).cast("double") / binWidth).cast("long"))
    val rBinned = right
      .withColumn("__bin_start", floor(col(rangeStart).cast("double") / binWidth).cast("long"))
      .withColumn("__bin_end", floor(col(rangeEnd).cast("double") / binWidth).cast("long"))
      .withColumn("__bin", explode(sequence(col("__bin_start"), col("__bin_end"))))
      .drop("__bin_start", "__bin_end")
    lBinned.join(rBinned, keys :+ "__bin")
      .filter(col(point) >= col(rangeStart) && col(point) <= col(rangeEnd))
      .drop("__bin")
  }
}
