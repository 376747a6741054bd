package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** X119 — per-file Bloom skipping: the EQUALITY complement to
  * [[ZoneMaps]]' range manifests. Zone maps prune on [min, max]
  * intervals, which only bite when the layout gives the column locality
  * (a range sort, Z-order); a point lookup on a scattered high-selectivity
  * key (tenant id, user id, doc id) intersects almost every file's range
  * and prunes nothing. A per-file Bloom filter answers "might file F
  * contain key v" regardless of layout — the ORC bloom-filter-per-stripe
  * / Delta bloom index idea, built engine-level on X89's row-form filter
  * (one row per set bit, md5 positions — the whole index replays in any
  * engine with md5, the q238 contract).
  *
  * Manifest layout (sidecars under `manifestDir`):
  *  - parquet rows `(__bs_file, pos)` — file × set bit;
  *  - `_graft_schema.json` — the dataset schema recorded at build (what
  *    lets an all-pruned read answer with zero data-file access);
  *  - `_graft_bloom.json` — the filter identity `(keyCol, bits, hashes,
  *    seed)`: probes read it back instead of trusting the caller, so a
  *    mismatched-identity probe is structurally impossible (the CMS/X89
  *    shared-identity contract, enforced rather than documented).
  *
  * Staleness contract = [[ZoneMaps]]' verbatim: [[prunedRead]] re-lists
  * the data directory (pure metadata) and REFUSES on any file-set drift;
  * [[buildIncremental]] is the append-path refresh — carried rows for
  * still-present files ride through the driver as (file, pos) pairs
  * (O(files × bits-touched-per-file); per-file key sets are the design
  * point — a file whose bloom saturates prunes nothing and should carry
  * a bigger `bits`), vanished files drop, and only NEW files are
  * scanned: O(new data) steady state.
  *
  * Scale audit: `build` is one column-pruned scan → hashes-way explode →
  * map-side-combined distinct on (file, pos) — output O(files ×
  * min(bits, keys·hashes)), corpus-row-independent. `prunedRead` decides
  * survivors with a JOIN (probe-positions table is |values|·hashes rows,
  * broadcast against the manifest; a file survives when EVERY position
  * of SOME probe value is set) and collects only the O(files) survivor
  * list — never the bit rows — before one ordinary parquet read of the
  * kept files with the equality predicate as the residual row filter.
  * False negatives are structurally impossible (require-audited in the
  * q281 lifecycle); false positives cost one extra file read at the
  * design rate. */
object BloomSkip {

  /** What [[prunedRead]] decided. */
  final case class PruneStats(filesTotal: Int, filesKept: Int)

  private def identityPath(manifestDir: String) =
    new org.apache.hadoop.fs.Path(manifestDir, "_graft_bloom.json")

  private final case class Identity(keyCol: String, bits: Int, hashes: Int,
      seed: String)

  private def writeIdentity(spark: SparkSession, manifestDir: String,
      id: Identity): Unit = {
    val json = s"""{"keyCol":"${id.keyCol}","bits":${id.bits},""" +
      s""""hashes":${id.hashes},"seed":"${id.seed}"}"""
    val out = ZoneMaps.fs(spark, manifestDir)
      .create(identityPath(manifestDir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readIdentity(spark: SparkSession,
      manifestDir: String): Identity = {
    val in = ZoneMaps.fs(spark, manifestDir).open(identityPath(manifestDir))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def str(k: String) = s""""$k":"([^"]*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"malformed bloom identity: $json")).group(1)
    def num(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"malformed bloom identity: $json")).group(1).toInt
    Identity(str("keyCol"), num("bits"), num("hashes"), str("seed"))
  }

  private def writeSchema(spark: SparkSession, manifestDir: String,
      schema: StructType): Unit = {
    val out = ZoneMaps.fs(spark, manifestDir).create(
      new org.apache.hadoop.fs.Path(manifestDir, "_graft_schema.json"), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  private def readSchema(spark: SparkSession, manifestDir: String): StructType = {
    val in = ZoneMaps.fs(spark, manifestDir).open(
      new org.apache.hadoop.fs.Path(manifestDir, "_graft_schema.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
  }

  /** One `(file, pos = -1)` row per listed file: the membership sentinel
    * that keeps a file with ZERO non-null keys in the manifest's file
    * set (it would otherwise read as "not covered" and wedge every
    * subsequent prune into the staleness refusal). Position −1 can never
    * match a probe (real positions are ≥ 0), so sentinel-only files
    * prune OUT — correct: no non-null key can satisfy an equality
    * probe, and `isin` never matches NULL. */
  private def sentinels(spark: SparkSession, files: Seq[String]): DataFrame = {
    import spark.implicits._
    files.toDF("__bs_file").select(col("__bs_file"), lit(-1L).as("pos"))
  }

  private def bitsFor(spark: SparkSession, dataDir: String,
      files: Seq[String], id: Identity): DataFrame = {
    val data = spark.read.option("basePath", dataDir)
      .parquet(files.toIndexedSeq: _*)
    require(data.columns.contains(id.keyCol),
      s"column '${id.keyCol}' not in schema")
    data.select(input_file_name().as("__bs_file"), col(id.keyCol).as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__bs_file"), explode(array((0 until id.hashes).map(i =>
        Sketches.bloomPos(col("__k"), i, id.bits, id.seed)): _*)).as("pos"))
      .distinct()
  }

  /** Build (or rebuild) the per-file Bloom manifest over `keyCol`. */
  def build(spark: SparkSession, dataDir: String, manifestDir: String,
      keyCol: String, bits: Int = 1 << 17, hashes: Int = 5,
      seed: String = "bskip"): Unit = {
    require(bits >= 2 && bits <= 100000000,
      s"bits must be in [2, 1e8] for the row layout, got $bits")
    require(hashes >= 1 && hashes <= 16,
      s"hashes must be in [1,16], got $hashes")
    val files = ZoneMaps.listDataFiles(spark, dataDir)
    require(files.nonEmpty, s"no data files under $dataDir")
    val id = Identity(keyCol, bits, hashes, seed)
    bitsFor(spark, dataDir, files, id)
      .unionByName(sentinels(spark, files)).coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)
    writeSchema(spark, manifestDir, spark.read.parquet(dataDir).schema)
    writeIdentity(spark, manifestDir, id)
  }

  /** Refresh after the data directory changed, scanning ONLY uncovered
    * files (the [[ZoneMaps.buildIncremental]] shape): rows for
    * still-present files carry over verbatim, vanished files drop, new
    * files scan. Returns (carriedFiles, addedFiles, droppedFiles). */
  def buildIncremental(spark: SparkSession, dataDir: String,
      manifestDir: String): (Int, Int, Int) = {
    val id = readIdentity(spark, manifestDir)
    val old = spark.read.parquet(manifestDir)
      .select(col("__bs_file"), col("pos")).collect()
    val oldFiles = old.map(r => ZoneMaps.normalizePath(r.getString(0))).toSet
    val current = ZoneMaps.listDataFiles(spark, dataDir)
    require(current.nonEmpty, s"no data files under $dataDir")
    val currentSet = current.map(ZoneMaps.normalizePath).toSet
    val carried = old.filter(r =>
      currentSet.contains(ZoneMaps.normalizePath(r.getString(0))))
    val carriedFiles = carried.map(r =>
      ZoneMaps.normalizePath(r.getString(0))).toSet
    val fresh = current.filterNot(f =>
      oldFiles.contains(ZoneMaps.normalizePath(f)))
    val schema = spark.read.parquet(dataDir).schema
    val freshStats =
      if (fresh.isEmpty) null
      else bitsFor(spark, dataDir, fresh, id)
        .unionByName(sentinels(spark, fresh))
    val carriedDf = spark.createDataFrame(
      java.util.Arrays.asList(carried: _*),
      StructType(Seq(
        org.apache.spark.sql.types.StructField("__bs_file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType))))
    val merged = if (freshStats == null) carriedDf
    else freshStats.unionByName(carriedDf)
    // stage into a sibling then swap would be the production move; a
    // driver-carried overwrite matches ZoneMaps' documented contract
    merged.coalesce(1).write.mode("overwrite").parquet(manifestDir)
    writeSchema(spark, manifestDir, schema)
    writeIdentity(spark, manifestDir, id)
    (carriedFiles.size, fresh.length, oldFiles.size - carriedFiles.size)
  }

  /** Read `dataDir` keeping only files whose Bloom might contain ANY of
    * `values` (IN-list point lookup), with `keyCol IN values` as the
    * residual row filter. Stale manifests refuse (file-set drift in
    * either direction); an empty survivor set answers from the recorded
    * schema with zero data-file access. */
  def prunedRead(spark: SparkSession, dataDir: String, manifestDir: String,
      values: Seq[Any]): (DataFrame, PruneStats) = {
    require(values.nonEmpty, "prunedRead needs at least one probe value")
    val id = readIdentity(spark, manifestDir)
    val manifest = spark.read.parquet(manifestDir)
    val manifestFiles = manifest.select("__bs_file").distinct()
      .collect().map(r => ZoneMaps.normalizePath(r.getString(0))).toSet
    val current = ZoneMaps.listDataFiles(spark, dataDir)
    val currentNorm = current.map(ZoneMaps.normalizePath).toSet
    // drift check is on the FULL listing, not the manifest's subset: an
    // all-NULL-key file has no bit rows but must still be drift-audited
    // — it is also never prunable-in, so it must be KEPT unconditionally
    // (its rows can't match an equality probe, but only the residual
    // filter may decide that; dropping an unknown file would be the
    // silent-wrong-answer class the staleness contract exists to stop)
    require(manifestFiles.subsetOf(currentNorm),
      "stale bloom manifest: it lists files no longer present — the " +
        "layout changed under it; rebuild or buildIncremental first")
    // a not-covered file COULD legitimately be all-NULL-keyed (zero bit
    // rows), but verifying that would read data — refuse instead: the
    // incremental refresh is cheap and unambiguous
    val unmapped = currentNorm -- manifestFiles
    require(unmapped.isEmpty,
      s"stale bloom manifest: ${unmapped.size} file(s) not covered — " +
        "run buildIncremental")
    import spark.implicits._
    val probes = values.map(String.valueOf).toDF("__pk")
      .select(col("__pk"), explode(array((0 until id.hashes).map(i =>
        Sketches.bloomPos(col("__pk"), i, id.bits, id.seed)): _*)).as("pos"))
    // a file survives when EVERY position of SOME probe value is set
    val kept = manifest.join(broadcast(probes), "pos")
      .groupBy(col("__bs_file"), col("__pk"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === id.hashes)
      .select("__bs_file").distinct()
      .collect().map(r => ZoneMaps.normalizePath(r.getString(0)))
    val stats = PruneStats(current.size, kept.length)
    val keptFull = current.filter(f =>
      kept.contains(ZoneMaps.normalizePath(f)))
    val frame =
      if (keptFull.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          readSchema(spark, manifestDir))
      else spark.read.option("basePath", dataDir)
        .parquet(keptFull.toIndexedSeq: _*)
    (frame.filter(col(id.keyCol).cast("string")
      .isin(values.map(String.valueOf): _*)), stats)
  }
}
