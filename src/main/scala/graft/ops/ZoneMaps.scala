package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a sidecar min/max manifest + manifest-driven file
  * pruning at read time — the data-skipping core every table format ships
  * (Delta stats / Iceberg manifests / ORC file stats), built engine-level.
  *
  * Why a SIDECAR when parquet already keeps row-group min/max: parquet
  * stats prune row groups only AFTER the scan has opened every file and
  * read every footer. At 100 TB / 128 MB files that is ~800k footer reads
  * per query BEFORE the first skip decision — the open/footer round-trips
  * (S3 GETs in production) dominate selective scans. A manifest holds all
  * per-file ranges in ONE tiny parquet, so the file set shrinks before any
  * data file is touched; parquet's own row-group stats then prune WITHIN
  * the survivors. The two layers compose, they don't compete — and both
  * only bite when the layout gives columns locality, which is what
  * [[Layout.zOrderBy]] / a range sort are for.
  *
  * Scale audit: `build` is one column-pruned distributed scan grouped by
  * `input_file_name()` — a map-side-combinable aggregation whose output is
  * O(files), not O(rows). `prunedRead` reads the manifest and filters it
  * DRIVER-side: O(files) rows, the same asymptotics (and the same driver
  * memory) as Spark's own `InMemoryFileIndex`, which already materializes
  * the full file listing on the driver for ANY parquet read — the manifest
  * collect adds no new scaling class, it just makes the listing carry
  * ranges. Nothing here scans data twice: kept files are handed to one
  * ordinary parquet read with the residual predicate pushed down.
  */
object ZoneMaps {

  /** One range predicate against a zone-mapped column: keep files whose
    * [min, max] interval intersects [lo, hi]. Bounds are inclusive and
    * literal (driver-known — the same contract as partition pruning). */
  final case class Range(column: String, lo: Any, hi: Any)

  /** What [[prunedRead]] decided: how many files the manifest listed and
    * how many survived the range intersection. */
  final case class PruneStats(filesTotal: Int, filesKept: Int)

  private def mnCol(c: String) = s"__zm_min_$c"
  private def mxCol(c: String) = s"__zm_max_$c"

  /** Build (or rebuild) the manifest for the parquet dataset at `dataDir`:
    * one row per data file with per-column min/max over `cols` plus a row
    * count, written (overwrite) to `manifestDir`. Columns may be any
    * orderable type — numeric, timestamp, string. NULLs don't contribute
    * to min/max (an all-NULL file carries NULL stats and is prunable for
    * any range predicate, since NULL never satisfies one).
    *
    * The stats come from a scan of exactly the stat columns — column
    * pruning keeps the build proportional to the zone-mapped columns, not
    * the table width. Incremental variant for append-only tables: run the
    * same aggregation over only the new files and append; this full-build
    * face is the compaction-time / bootstrap path. */
  def build(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone maps need at least one column")
    val data = spark.read.parquet(dataDir)
    val missing = cols.filterNot(data.columns.contains)
    require(missing.isEmpty, s"column(s) not in schema: ${missing.mkString(",")}")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(mnCol(c)), max(col(c)).as(mxCol(c)))) :+
      count(lit(1)).as("__zm_rows")
    data.select(input_file_name().as("__zm_file") +: cols.map(col): _*)
      .groupBy("__zm_file")
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** Read `dataDir` with manifest-driven file skipping: drop every file
    * whose zone-map interval cannot intersect ALL of `ranges`, then apply
    * the same ranges as a residual row filter (zone maps are a file-level
    * superset — kept files still carry out-of-range rows). Returns the
    * filtered frame plus the prune decision.
    *
    * A file with NULL stats for a ranged column (all-NULL values, or the
    * column added after that file was written) is skipped: a range
    * predicate is NULL-rejecting, so no row in it can match. The survivor
    * list is collected on the driver (O(files) — see the class doc) and
    * handed to `spark.read` with `basePath` so directory-partition columns
    * survive the explicit file listing. An empty survivor set returns an
    * empty frame with the dataset's schema — no scan at all, the best case
    * data skipping has. */
  def prunedRead(spark: SparkSession, dataDir: String, manifestDir: String,
      ranges: Seq[Range]): (DataFrame, PruneStats) = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    val manifest = spark.read.parquet(manifestDir)
    // NULL stats (all-NULL file) make the comparison NULL → coalesce to
    // false: a range predicate is NULL-rejecting, so skipping is safe
    val keep = coalesce(ranges.map { r =>
      col(mxCol(r.column)) >= lit(r.lo) && col(mnCol(r.column)) <= lit(r.hi)
    }.reduce(_ && _), lit(false))
    val files = manifest.select(col("__zm_file"), keep.as("__zm_keep"))
      .collect()
    val kept = files.filter(_.getBoolean(1)).map(_.getString(0)).sorted
    val residual = ranges.map(r =>
      col(r.column) >= lit(r.lo) && col(r.column) <= lit(r.hi))
      .reduce(_ && _)
    val df =
      if (kept.isEmpty) {
        val schema = spark.read.parquet(dataDir).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
      } else {
        spark.read.option("basePath", dataDir).parquet(kept.toIndexedSeq: _*)
      }
    (df.filter(residual), PruneStats(files.length, kept.length))
  }

  /** Deterministic range-clustered write: sort by `sortCols`, cut into
    * files of exactly `rowsPerFile` rows (last file short), one data file
    * per shard, shard id recorded as a directory partition. This is the
    * layout under which zone maps on the leading sort column prune
    * perfectly — file i covers one contiguous value run — and, because
    * shard membership is a pure function of the sorted row number, the
    * whole file population (count, per-file ranges, which files a
    * predicate keeps) is REPLAYABLE by any engine from the rows alone,
    * which is what lets an external oracle audit the prune decision
    * itself, not just the returned rows.
    *
    * The row numbering is one global window — a single-reducer pass, fine
    * for fixtures and for the per-partition tail of a production write; a
    * 100 TB layout gets the same contiguous runs from
    * `repartitionByRange + sortWithinPartitions` (no global window) at the
    * cost of sampled, non-replayable cut points. Both layouts read back
    * identically; only the auditability differs. */
  def writeRangeSharded(df: DataFrame, dataDir: String, sortCols: Seq[String],
      rowsPerFile: Long): Unit = {
    require(sortCols.nonEmpty, "writeRangeSharded needs at least one sort column")
    require(rowsPerFile >= 1, s"rowsPerFile must be positive, got $rowsPerFile")
    require(!df.columns.contains("__zm_shard"),
      "column name __zm_shard is reserved by writeRangeSharded")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(sortCols.map(col): _*)
    val sharded = df.withColumn("__zm_shard",
      ((row_number().over(w) - 1) / rowsPerFile).cast("long"))
    sharded
      .repartition(col("__zm_shard"))
      .write.mode("overwrite").partitionBy("__zm_shard").parquet(dataDir)
  }
}
