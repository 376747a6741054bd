package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** X75 — a SEGMENTED MATERIALIZED AGGREGATE: incremental view maintenance
  * for grouped count/sum/min/max/avg rollups, carried by the
  * [[graft.core.Table]] append ledger (X59) — the Druid/Pinot ingestion
  * rollup re-expressed as two pure relational faces over plain parquet.
  *
  * The gap it fills: a dashboard-style grouped aggregate over a 100 TB
  * event stream cannot re-scan the corpus per refresh, and a streaming
  * `groupBy` holds its state hostage inside a checkpoint only Spark can
  * read. The classical answer (every OLAP ingestion layer ships it) is to
  * aggregate each ARRIVAL BATCH to per-group partials and keep the view as
  * the MERGE of the partials — sound exactly when every measure is a
  * commutative monoid, which count/sum/min/max are and avg becomes once
  * it is carried as (sum, count). Per batch the corpus-sized work is ONE
  * map-side-combinable aggregation of that batch alone; the view read
  * touches O(groups × segments) partial rows, never a raw row again.
  *
  * Exactly-once: partials commit through [[graft.core.Table
  * .ledgerAppendIfAbsent]] — an orchestrator-level replay of a segment id
  * no-ops without even building the batch's plan (by-name `batch`), the
  * q204 discipline. Compaction IS re-aggregation: [[compact]] passes
  * [[merge]] as `ledgerCompact`'s fold, so the folded base shrinks back
  * to one row per group (O(groups), not O(groups × segments)) — the
  * merge-preservation contract holds because merging partials of partials
  * is the same monoid fold (spec-pinned: fold-then-read ≡ read).
  *
  * Determinism (the cross-engine stance of [[Ops.sumDec]]): partial sums
  * are carried as DECIMAL(28, scale) — exact for fixed-point-valued
  * doubles, addition-order-free — and only the READ face presents them as
  * doubles (one correctly-rounded conversion) with avg as one double
  * division of exact operands. A double-typed partial would re-introduce
  * partial-aggregation-order dependence at every merge.
  *
  * NULL semantics are SQL's: `cnt` counts rows; per measure `cnt_c`
  * counts non-NULL values (the avg denominator), sum/min/max ignore
  * NULLs, and a group whose measure is all-NULL carries NULL partials
  * that later merges ignore. NULL group keys group together, as in SQL. */
object AggView {

  /** One rolled-up measure: a numeric column whose values are exact at
    * `scale` decimal places (2 = money, 6 = micro-pinned scores). */
  final case class Measure(column: String, scale: Int = 2)

  private def sumType(m: Measure) = DecimalType(28, m.scale)

  private def checkSpec(schema: Seq[String], groupCols: Seq[String],
      measures: Seq[Measure]): Unit = {
    require(groupCols.nonEmpty, "aggView needs at least one group column")
    // measures MAY be empty: a count-only rollup is the most common
    // materialized view there is, and cnt alone is already a monoid
    require(measures.map(_.column).distinct.size == measures.size,
      s"duplicate measure columns: ${measures.map(_.column)}")
    val missing = (groupCols ++ measures.map(_.column)).filterNot(schema.contains)
    require(missing.isEmpty, s"column(s) not in frame: ${missing.mkString(",")}")
    val clash = groupCols.filter(g => g == "cnt" ||
      measures.exists(m => Seq(s"cnt_${m.column}", s"sum_${m.column}",
        s"min_${m.column}", s"max_${m.column}").contains(g)))
    require(clash.isEmpty,
      s"group column(s) collide with generated partial names: $clash")
    require(measures.forall(m => !groupCols.contains(m.column)),
      "a column cannot be both a group key and a measure")
  }

  /** The partial-aggregation column set — the ONE definition of what a
    * partial row is, shared by the arrival-batch face ([[partials]]) and
    * the event-time streaming face
    * ([[graft.streaming.Streams.windowedAggPartials]]): a face-local
    * fork here is a view that can disagree with itself. */
  def partialAggs(measures: Seq[Measure]): Seq[org.apache.spark.sql.Column] =
    count(lit(1)).as("cnt") +: measures.flatMap { m =>
      val c = col(m.column)
      Seq(count(c).as(s"cnt_${m.column}"),
        sum(c.cast(DecimalType(18, m.scale))).cast(sumType(m))
          .as(s"sum_${m.column}"),
        min(c).as(s"min_${m.column}"),
        max(c).as(s"max_${m.column}"))
    }

  /** One batch → its per-group PARTIALS — the only corpus-sized work in
    * the lifecycle (one aggregation with map-side combine; shuffled bytes
    * are O(groups per partition), not O(rows)). */
  def partials(batch: DataFrame, groupCols: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    checkSpec(batch.columns.toIndexedSeq, groupCols, measures)
    val aggs = partialAggs(measures)
    batch.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[checkSpec]] for callers that aggregate through their own grouping
    * (the windowed streaming face groups by `window(ts)` + keys, which
    * [[partials]]' flat groupBy cannot express). */
  private[graft] def checkMeasures(schema: Seq[String], groupCols: Seq[String],
      measures: Seq[Measure]): Unit = checkSpec(schema, groupCols, measures)

  /** Merge partial rows (any number of segments' worth) back to one row
    * per group — the monoid fold. Output schema ≡ [[partials]] schema, so
    * merge(merge(x)) = merge(x) and [[compact]] can pass this as the
    * ledger's fold. */
  def merge(parts: DataFrame, groupCols: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    val aggs = sum(col("cnt")).cast("long").as("cnt") +: measures.flatMap { m =>
      Seq(sum(col(s"cnt_${m.column}")).cast("long").as(s"cnt_${m.column}"),
        sum(col(s"sum_${m.column}")).cast(sumType(m)).as(s"sum_${m.column}"),
        min(col(s"min_${m.column}")).as(s"min_${m.column}"),
        max(col(s"max_${m.column}")).as(s"max_${m.column}"))
    }
    parts.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Commit batch `segId`'s partials exactly once; false = replay no-op
    * (the batch plan is never built — `batch` is by-name). Ids follow the
    * ledger's gap-free 0..N convention (streaming: batchId). */
  def commitSegment(spark: SparkSession, dir: String, name: String,
      segId: Long, batch: => DataFrame, groupCols: Seq[String],
      measures: Seq[Measure]): Boolean =
    graft.core.Table(spark, dir, name)
      .ledgerAppendIfAbsent(segId, partials(batch, groupCols, measures))

  /** Commit ALREADY-partial rows exactly once — the sink half of the
    * event-time streaming face, where the rows arriving in foreachBatch
    * are finalized `(window_start, keys…, partials…)` rows the watermarked
    * streaming aggregation produced ([[graft.streaming.Streams
    * .windowedAggPartials]]); re-running [[partials]] over them would
    * double-aggregate. Empty batches commit empty deltas — the ledger's
    * gap-free id sequence must absorb the no-data flush batches a
    * watermark advance triggers. */
  def commitPartials(spark: SparkSession, dir: String, name: String,
      segId: Long, parts: => DataFrame): Boolean =
    graft.core.Table(spark, dir, name).ledgerAppendIfAbsent(segId, parts)

  /** Fold fragmented segments through [[merge]] when live deltas exceed
    * `maxDeltas` — compaction-as-re-aggregation: the new base is one row
    * per group however many segments it absorbed. Returns whether a fold
    * ran. Reads before and after are value-identical. */
  def compact(spark: SparkSession, dir: String, name: String,
      groupCols: Seq[String], measures: Seq[Measure],
      maxDeltas: Int): Boolean =
    graft.core.Table(spark, dir, name)
      .ledgerCompact(maxDeltas, merge(_, groupCols, measures))

  /** The VIEW: committed partials merged and presented — exact decimal
    * sums as doubles ([[Ops.sumDec]]'s presentation stance), `avg_c` as
    * one double division of the exact sum by the non-NULL count (NULL for
    * all-NULL groups), min/max in the measure's own type. O(groups ×
    * live segments) rows scanned; raw data untouched. */
  def read(spark: SparkSession, dir: String, name: String,
      groupCols: Seq[String], measures: Seq[Measure]): DataFrame = {
    val merged = merge(graft.core.Table(spark, dir, name).readLedger,
      groupCols, measures)
    val out = groupCols.map(col) ++ Seq(col("cnt")) ++ measures.flatMap { m =>
      val c = m.column
      Seq(col(s"cnt_$c"), col(s"sum_$c").cast("double").as(s"sum_$c"),
        when(col(s"cnt_$c") > 0,
          col(s"sum_$c").cast("double") / col(s"cnt_$c"))
          .as(s"avg_$c"),
        col(s"min_$c"), col(s"max_$c"))
    }
    merged.select(out: _*)
  }
}
