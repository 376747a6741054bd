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
    // try_parse_json + the member walk is the map-heavy shape that must
    // ride every core. ROUND-ROBIN (placement-independent — the census is
    // a keyed aggregation): the former payload-keyed spread hashed every
    // payload just for placement and sent all identical documents
    // (boilerplate/empty objects, common in real corpora) to ONE
    // partition — recreating the skew it existed to fix. The partition
    // count is EXPLICIT (defaultParallelism — the core count, a scale
    // knob, never a constant): a count-less repartition is
    // AQE-coalescible, and a ~MB-sized shuffle coalesces back to ONE
    // partition. Nothing downstream filters on a post-spread column, so
    // the pushdown-through-repartition trap (q152/q166, r18) can't bite.
    val parsed = base.filter(col("__j").isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(expr("try_parse_json(__j)").as("__v"))
    // ONE map-only pass: per row, the bounded member walk runs as a chain
    // of `maxDepth` higher-order transforms building the full (path, tag)
    // entry array in-row — level d+1 = object members of level d, arrays
    // never walked, `from_json(to_json(v), map<string,variant>)` as the
    // one dynamic-key recursion primitive exactly as before. The former
    // shape materialized every level through an eager localCheckpoint
    // chain (maxDepth+1 driver actions + corpus-sized block litter) just
    // to stop Spark re-parsing the root chain per level consumer; with
    // the walk in-row there is nothing to re-parse — each level array is
    // a lambda-local value feeding both its census entries and the next
    // level, so the whole census is the spread exchange + one
    // aggregation, two driver actions total (the input count and the
    // census job), zero retained blocks.
    val entrySchema = "array<struct<path:string,v:variant>>"
    val root = array(struct(lit("$").as("path"), col("__v").as("v")))
      .cast(entrySchema)
    def expand(lvl: Column): Column =
      flatten(transform(
        filter(lvl, e => typeOf(e.getField("v")) === "object"),
        e => transform(
          map_entries(from_json(to_json(e.getField("v")),
            "map<string,variant>", java.util.Collections.emptyMap[String, String]())),
          m => struct(
            concat(e.getField("path"), lit("."), m.getField("key")).as("path"),
            m.getField("value").as("v")))))
    val levels = (1 until maxDepth).scanLeft(expand(root))((prev, _) =>
      expand(prev))
    val entries = concat(root +: levels: _*)
    val tagged = parsed.select(
        when(col("__v").isNotNull,
          transform(entries, e => struct(e.getField("path").as("path"),
            typeOf(e.getField("v")).as("tag"))))
          // unparseable non-null text lands in ONE (malformed) entry —
          // never in the type histogram
          .otherwise(array(struct(lit("(malformed)").as("path"),
            lit("malformed").as("tag"))))
          .as("__entries"))
      .select(explode(col("__entries")).as("__e"))
      .select(col("__e.path").as("path"), col("__e.tag").as("__tag"))
    def cnt(t: String) = sum(when(col("__tag") === t, 1L).otherwise(0L))
    tagged.groupBy("path")
      .agg(count(lit(1)).as("n"),
        cnt("object").as("n_object"), cnt("array").as("n_array"),
        cnt("string").as("n_string"), cnt("number").as("n_number"),
        cnt("boolean").as("n_boolean"), cnt("null").as("n_null"))
      .withColumn("present_micro", expr(s"n * 1000000 DIV ${total}L"))
  }
}
