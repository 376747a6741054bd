package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series densification (SURVEY.md §2.7 adjunct): aggregate per
  * (key, time bucket) and emit a row for EVERY bucket in each key's
  * [min, max] range — empty buckets included. Dashboards, rate alerts and
  * forecasting all break on sparse aggregates ("no row" ≠ "zero events");
  * a plain groupBy can't distinguish the two.
  */
object TimeSeries {

  /** Gap-filled per-(keys, bucket) aggregates.
    *
    *   - `step`: bucket width + grid pitch (e.g. "1 hour") — buckets are
    *     epoch-aligned tumbling windows (`window(ts, step).start`);
    *   - `aggs`: (name, aggregate expression) computed per (keys, bucket);
    *   - `fill`: per-output-column literal for empty buckets (unlisted
    *     columns stay NULL there — "unknown", not "zero"; counts usually
    *     fill 0, gauges usually stay null).
    *
    * Plan shape at scale: one partial-combinable aggregation, a keys-sized
    * range aggregate, a `sequence`-explode of the grid (output-sized — the
    * densified table IS the product), and one keyed left join. No window
    * functions, no per-key single task, no driver materialization. Keys
    * with a single bucket yield that bucket. Rows with NULL ts are ignored
    * (no defined bucket); a NULL key is a valid group and gap-fills like
    * any other. */
  def gapFill(events: DataFrame, keys: Seq[String], tsCol: String,
      step: String, aggs: Seq[(String, Column)],
      fill: Map[String, Column] = Map.empty): DataFrame = {
    require(aggs.nonEmpty, "gapFill needs at least one aggregate")
    val reserved = Seq("bucket", "__lo", "__hi")
      .filter(r => keys.contains(r) || aggs.exists(_._1 == r))
    require(reserved.isEmpty,
      s"${reserved.mkString(", ")} reserved by gapFill; rename first")
    val clashes = aggs.map(_._1).filter(keys.contains)
    require(clashes.isEmpty,
      s"aggregate name(s) collide with key column(s): ${clashes.mkString(", ")}")
    fill.keys.foreach(k => require(aggs.exists(_._1 == k),
      s"fill column '$k' is not an aggregate output"))
    val bucket = window(col(tsCol), step).getField("start")
    val agged = events
      .filter(col(tsCol).isNotNull)
      .groupBy((keys.map(col) :+ bucket.as("bucket")): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val range = agged.groupBy(keys.map(col): _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
    val grid = range
      .select((keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr(s"INTERVAL $step")))
          .as("bucket")): _*)
    // null-safe key equality: a NULL key is a real group ("events with no
    // type") and must match its own aggregate rows back — a plain using-
    // join would leave every one of its buckets empty
    val cond = keys.map(k => col(s"g.$k") <=> col(s"a.$k"))
      .foldLeft(col("g.bucket") === col("a.bucket"))(_ && _)
    val joined = grid.alias("g").join(agged.alias("a"), cond, "left")
      .select((keys.map(k => col(s"g.$k")) :+ col("g.bucket")) ++
        aggs.map { case (n, _) => col(s"a.$n") }: _*)
    fill.foldLeft(joined) { case (df, (name, lit_)) =>
      df.withColumn(name, coalesce(col(name), lit_))
    }
  }
}
