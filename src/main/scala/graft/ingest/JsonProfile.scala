package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X84 — semi-structured JSON key-path profiling: the schema-drift radar a
  * JSON lake needs before anything else can be built on it. Raw event
  * payloads, API dumps, and scraped metadata arrive as JSON text whose
  * shape nobody governs; the first question is always "what paths exist,
  * how often, and with what types" — the inference step behind every
  * schema-on-read system (Spark's own JSON inference samples the corpus to
  * answer exactly this, then throws the census away; Snowflake/BigQuery
  * ship it as a profiling view). The census drives ingestion contracts
  * (X8 validation rules), drift alarms (a path's presence rate moving
  * between batches — X22's PSI over this output), and flattening plans.
  *
  * Built on Spark 4's native variant machinery — `try_parse_json` +
  * `from_json(…, map<string,variant>)` as the one dynamic-key recursion
  * primitive (no UDF, no driver-side JSON walking): each level explodes
  * object members into (path, variant) rows, `schema_of_variant`
  * classifies each value, and one path-keyed aggregation with map-side
  * combine produces the census. Recursion depth is a bounded config
  * (`maxDepth` levels of object nesting), so the plan is a fixed union of
  * `maxDepth` map-only stages — fan-out per row = its key count per
  * level, never corpus-squared.
  *
  * Semantics: an explicit JSON `null` is PRESENT with type `null`
  * (absent-vs-null is the drift signal that matters most — a field going
  * null is an upstream bug, a field disappearing is a schema change);
  * arrays are counted as `array` but not walked (explode elements
  * upstream and re-profile when element shape matters); unparseable
  * non-null text lands in a `(malformed)` row instead of vanishing; a
  * path's `present_micro` is `n·1e6 DIV total` over ALL input rows. Keys
  * containing `.` concatenate ambiguously into the path string (the flat
  * census stays correct; rename such keys upstream if path strings must
  * be parseable). All counts are exact integers — engine-replayable.
  *
  * Output: one row per discovered path (plus `$` for the root and
  * `(malformed)` when present):
  * `(path, n, n_object, n_array, n_string, n_number, n_boolean, n_null,
  * present_micro)`. */
object JsonProfile {

  /** The one type classifier both the census and its tests pin: variant
    * schema string → {object, array, string, number, boolean, null}. */
  private def typeOf(v: Column): Column = {
    val t = schema_of_variant(v)
    when(t.startsWith("OBJECT"), "object")
      .when(t.startsWith("ARRAY"), "array")
      .when(t === "STRING", "string")
      .when(t.startsWith("DECIMAL") || t === "BIGINT" || t === "DOUBLE" ||
        t === "FLOAT", "number")
      .when(t === "BOOLEAN", "boolean")
      .otherwise("null") // VOID — the explicit JSON null
  }

  def pathProfile(df: DataFrame, json: Column, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8,
      s"maxDepth must be in [1, 8], got $maxDepth")
    val base = df.select(json.cast("string").as("__j"))
    val total = base.count()
    require(total > 0, "pathProfile: empty input")
    // Spread rows before the per-row variant parse: scan parallelism is
    // row-group-bounded (a single-row-group file is ONE task), and
    // try_parse_json + the per-level re-serialization is the map-heavy
    // shape that must ride every core. Hash-partitioned on the payload
    // (deterministic under retries), spark.sql.shuffle.partitions-sized;
    // the census is a keyed aggregation, so placement changes nothing.
    // The partition count is EXPLICIT (defaultParallelism — the core
    // count): a count-less keyed repartition is AQE-coalescible, and a
    // ~MB-sized payload shuffle coalesces back to ONE partition.
    val parsed = base.filter(col("__j").isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("__j"))
      .select(expr("try_parse_json(__j)").as("__v"), col("__j"))
    val root = parsed.filter(col("__v").isNotNull)
      .select(lit("$").as("path"), col("__v"))
    val malformed = parsed.filter(col("__v").isNull)
      .select(lit("(malformed)").as("path"),
        expr("try_parse_json('null')").as("__v"))
    // level d+1 = object members of level d; from_json(to_json(v)) of a
    // non-object is null → explode yields nothing, closing the recursion.
    // Each level is lineage-truncated ONCE and that frame feeds BOTH the
    // census union and the next level — without the cut Spark re-parses
    // the whole root chain per consumer, O(depth²) variant parses. At
    // this fixture's shallow fan-out the cut is roughly a wash (the
    // per-level materialization buys back what the recompute cost); at
    // real nesting depth the quadratic term dominates and the cut is
    // what bounds it.
    def members(lvl: org.apache.spark.sql.DataFrame) =
      lvl.filter(typeOf(col("__v")) === "object")
        .select(col("path"),
          explode(expr("from_json(to_json(__v), 'map<string,variant>')"))
            .as(Seq("__k", "__m")))
        .select(concat(col("path"), lit("."), col("__k")).as("path"),
          col("__m").as("__v"))
    val levels = scala.collection.mutable.ArrayBuffer(
      graft.core.Checkpointing.truncate(root, eager = true, None))
    for (_ <- 1 to maxDepth)
      levels += graft.core.Checkpointing.truncate(members(levels.last),
        eager = true, None)
    val tagged = (levels :+ malformed).reduce(_ unionAll _)
      .select(col("path"),
        // malformed rows carry a VOID placeholder variant; re-tag them so
        // they never count into the type histogram
        when(col("path") === "(malformed)", lit("malformed"))
          .otherwise(typeOf(col("__v"))).as("__tag"))
    def cnt(t: String) = sum(when(col("__tag") === t, 1L).otherwise(0L))
    tagged.groupBy("path")
      .agg(count(lit(1)).as("n"),
        cnt("object").as("n_object"), cnt("array").as("n_array"),
        cnt("string").as("n_string"), cnt("number").as("n_number"),
        cnt("boolean").as("n_boolean"), cnt("null").as("n_null"))
      .withColumn("present_micro", expr(s"n * 1000000 DIV ${total}L"))
  }
}
