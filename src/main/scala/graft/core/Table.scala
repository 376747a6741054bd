package graft.core

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Named-table handle over a Parquet directory — the Spark-native analog of the
  * reference's `PostgresDataset` (reference: data_preparation_plugin/hooks/dataset.py:62-86).
  *
  * The reference identifies a dataset by `(pg_schema, name)` and uses it as a
  * schema handle, batch source, batch sink, and reflection surface. Here the
  * same surface is a thin veneer over `spark.read.parquet` / `df.write.parquet`:
  * Parquet is self-describing, so reflection (dataset.py:88-118) is a footer
  * read, and all relational work stays a lazy Catalyst plan until an action.
  *
  * Scale notes (100 TB): every method is either metadata-only (schema) or
  * returns/writes a distributed DataFrame; nothing here collects to the driver
  * except [[iterRows]], which streams one partition at a time by design
  * (it mirrors the reference's row-dict iterator, dataset.py:139-157).
  */
final case class Table(spark: SparkSession, dir: String, name: String) {

  /** Physical location; one parquet dataset (possibly many part files). */
  def path: String = s"$dir/$name.parquet"

  /** Full-table scan (reference `get_dataframe`, dataset.py:120-126). Lazy:
    * Catalyst prunes columns and pushes filters into the parquet scan, so
    * unlike the reference's `SELECT *` this never over-reads. */
  def read: DataFrame = spark.read.parquet(path)

  /** Schema handle (reference `read_dtype`, dataset.py:163-170). */
  def schema: StructType = read.schema

  /** Typed view (reference `reflect`, dataset.py:88-118: table → ORM mapped
    * class). Parquet's self-describing schema plays the reflection role; the
    * case-class encoder gives the typed-row access the ORM mapper gave. */
  def typed[T: org.apache.spark.sql.Encoder]: org.apache.spark.sql.Dataset[T] = read.as[T]

  /** Chunked scan (reference `get_dataframes`, dataset.py:128-137). Chunks are
    * partitions in Spark; this only forces an explicit chunk count — normally
    * the scan's own splits (`spark.sql.files.maxPartitionBytes`) are better. */
  def readChunks(numChunks: Int): DataFrame = read.repartition(numChunks)

  /** Rows-per-chunk scan — the reference's exact `get_dataframes(chunksize)`
    * contract (dataset.py:128-137: pandas `chunksize` = rows per chunk, so 5
    * rows at chunksize 2 → 3 chunks). Chunk count = ⌈rows / rowsPerChunk⌉,
    * realized as that many partitions. Costs a count (parquet metadata read)
    * plus a round-robin shuffle; partitions hold `rowsPerChunk` rows only
    * approximately (round-robin balance), which is what a rows-based batch
    * contract needs — exact row placement would force a global sort. */
  def readChunksOf(rowsPerChunk: Long): DataFrame = {
    require(rowsPerChunk > 0, "rowsPerChunk must be positive")
    val n = read.count()
    // integer math end to end: a Double→Int conversion would silently clamp
    // past 2^31 and ask for the driver-killing partition count instead of
    // failing with an actionable message
    val chunks = math.max(1L, (n + rowsPerChunk - 1) / rowsPerChunk)
    require(chunks <= 1000000L,
      s"readChunksOf($rowsPerChunk) on $n rows needs $chunks chunks — beyond any " +
        "sane partition count; raise rowsPerChunk")
    read.repartition(chunks.toInt)
  }

  /** Row-by-row iteration with optional head limit (reference `iter_rows`,
    * dataset.py:139-157). `toLocalIterator` fetches one partition at a time —
    * bounded driver memory even on a huge table. Driver-side by nature; never
    * use inside an operator. */
  def iterRows(head: Option[Int] = None): Iterator[Row] = {
    val df = head.fold(read)(n => read.limit(n))
    df.toLocalIterator().asScala
  }

  /** Append with schema compatibility check (reference `write_dataframe`,
    * dataset.py:49-59: "the dataframe columns must match the table's"). */
  def append(df: DataFrame): Unit = {
    val tgt = Schemas.normalize(schema)
    val src = Schemas.normalize(df.schema)
    require(src == tgt, s"append schema mismatch for $name:\n  table: $tgt\n  frame: $src")
    df.write.mode(SaveMode.Append).parquet(path)
  }

  /** Drop-and-recreate with data (reference `write_dtype` + load semantics;
    * dataset.py:172-187 drops and recreates). */
  def overwrite(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Replace table with inferred schema and a synthetic `id` column
    * (reference `write_with_schema`, dataset.py:189-201, which lets pandas
    * infer DDL and adds the frame index as `id`).
    *
    * `dense = false` (default) uses `monotonically_increasing_id()` — O(1),
    * no shuffle, ids unique but not consecutive: the right choice at scale.
    * `dense = true` reproduces the reference's consecutive 0..n-1 index via a
    * global `row_number()`, which forces a single-partition window — only for
    * small tables or when an oracle depends on id values. */
  def writeWithSchema(df: DataFrame, dense: Boolean = false): Unit = {
    require(!df.columns.contains("id"),
      s"writeWithSchema injects a synthetic `id` column but the frame already has one " +
        s"(columns: ${df.columns.mkString(", ")}); rename it or use overwrite()")
    val withId =
      if (dense)
        df.withColumn("id", row_number().over(Window.orderBy(monotonically_increasing_id())).cast(LongType) - 1)
      else
        df.withColumn("id", monotonically_increasing_id())
    overwrite(withId.select((col("id") +: df.columns.map(col)).toSeq: _*))
  }

  /** Overwrite with a bounded number of rows per output file — the training-
    * shard writer (dataloaders want bounded shards; a task writing a skewed
    * partition otherwise produces one giant file). `maxRecordsPerFile`
    * splits any oversized task output distributively — no driver-side
    * count. Shards can still come out SMALLER than the bound (one per task
    * tail); pair with `readChunksOf`/`repartition` upstream when uniform
    * shard sizes matter more than an extra shuffle. */
  def overwriteSharded(df: DataFrame, rowsPerShard: Long): Unit = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerShard)
      .parquet(path)
  }

  /** Overwrite with hive-style partitioned layout (`.../col=value/...`).
    * The 100 TB layout tool: queries filtering on `partitionCols` prune
    * whole directories at planning time (PartitionFilters in the scan), and
    * dynamic partition pruning covers join-derived filters. Choose low-
    * cardinality columns (date, source, category); high-cardinality
    * partitioning makes small files. */
  def overwritePartitioned(df: DataFrame, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Overwrite with a BUCKETED layout registered in the session catalog —
    * the co-located-join tool. Two tables bucketed by the same keys into the
    * same bucket count join WITHOUT a shuffle of either side (the scan is
    * already hash-distributed by the join key), and with `sortCols` = the
    * bucket keys the sort-merge join skips its sorts too: the big fact-fact
    * join becomes a pure zip of pre-organized files. That converts the
    * single most expensive recurring operation of a 100 TB pipeline — the
    * repeated fact⋈fact shuffle — into a one-time write-side cost.
    *
    * Bucket metadata lives in the catalog (Spark cannot recover bucketing
    * from bare parquet paths), so bucketed tables are read back with
    * `spark.table(name)`, not `spark.read.parquet`. */
  def overwriteBucketed(df: DataFrame, buckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    // The catalog is a single namespace per session; qualify the identifier
    // with the table's dir so two handles named `t` under different dirs
    // don't stomp each other's catalog entry. Never drop a MANAGED table of
    // the same name — dropping managed deletes its DATA, and a pre-existing
    // managed table is by definition not ours (we only create EXTERNAL).
    if (spark.catalog.tableExists(catalogName)) {
      require(spark.catalog.getTable(catalogName).tableType != "MANAGED",
        s"catalog already holds a MANAGED table `$catalogName` (dropping it would " +
          "delete its data); rename this Table or drop the managed table explicitly")
      spark.sql(s"DROP TABLE IF EXISTS `$catalogName`")
    }
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(catalogName)
  }

  /** Session-catalog identifier for the bucketed face of this table:
    * name + a dir-derived suffix (the dir is the real namespace). The dir
    * is normalized first (Hadoop Path semantics: trailing slashes, `.`
    * segments, double slashes) so two spellings of one directory resolve to
    * ONE catalog entry, and the suffix is 16 hex chars of MD5 so distinct
    * dirs colliding is cryptographically unlikely (String.hashCode's 32
    * bits collide in the thousands-of-dirs range). */
  private def catalogName: String = {
    val normalized = new org.apache.hadoop.fs.Path(dir).toString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(normalized.getBytes("UTF-8"))
    s"${name}_${md5.take(8).map(b => f"$b%02x").mkString}"
  }

  /** Catalog read of a bucketed table (bucket-aware scan). */
  def readBucketed: DataFrame = spark.table(catalogName)

  /** Write an empty table with an explicit schema (reference `write_dtype`,
    * dataset.py:172-187: drop + recreate empty). */
  def writeSchema(dtype: StructType): Unit =
    overwrite(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dtype))

  /** Buffered row-at-a-time writer (reference `PostgresDatasetWriter`,
    * dataset.py:13-47). Driver-side convenience for trickle ingest; bulk data
    * should go through [[append]]/[[overwrite]]. */
  def writer(dtype: StructType, chunkSize: Int = 1000): RowWriter =
    new RowWriter(this, dtype, chunkSize)

  /** Rewrite the table into `numFiles` parquet files — the small-files
    * maintenance op (a RowWriter/trickle-append workload leaves one file per
    * flush; thousands of tiny files wreck scan planning at scale). One scan
    * + shuffle + write into a temp dataset, then an atomic-ish directory
    * swap via the Hadoop FileSystem API — works on HDFS/S3A/local alike and
    * avoids a second full rewrite. [[graft.ops.Layout.compact]] is the
    * size-targeted sibling: it derives the file count from total bytes and
    * rewrites via an exchange-FREE coalesce (pure IO, no shuffle) — prefer
    * it when the table is large enough that the repartition network pass
    * dominates; prefer this one when the caller owns the directory swap
    * contract or needs exact output balance. */
  def compact(numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    swapInRewrite(read.repartition(numFiles))
  }

  /** The size-TARGETED, exchange-free sibling of [[compact]]: output file
    * count derives from total bytes (⌈bytes/targetBytes⌉) and the rewrite
    * is a `coalesce` — splits PACK into tasks with no Exchange, so the
    * rewrite stays IO-bound ([[graft.ops.Layout.compact]]'s arithmetic
    * with THIS handle's rename-aside swap). Prefer it for in-loop state
    * maintenance, where a repartition's network pass buys nothing. */
  def compactPacked(targetBytes: Long): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    healSwap() // a crashed swap leaves path missing — the listing would see 0
    val total = listDataFiles().map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    swapInRewrite(read.coalesce(n))
  }

  /** Fragmentation-triggered maintenance — the production cadence (Delta
    * OPTIMIZE / Iceberg rewrite run when fragmentation crosses a line, not
    * unconditionally): one metadata-only listing counts data files; at or
    * under `maxFiles` this is a no-op (a listing, no job), above it the
    * table rewrites via [[compactPacked]]. Returns true when compaction
    * ran. An append-every-batch lifecycle calls this each batch and pays
    * for a rewrite only when accretion actually crossed the threshold. */
  def compactIfFragmented(maxFiles: Int, targetBytes: Long): Boolean = {
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    healSwap() // a crashed swap reads as 0 files — heal before counting
    if (listDataFiles().size <= maxFiles) false
    else { compactPacked(targetBytes); true }
  }

  /** Metadata-only recursive listing of this table's parquet data files
    * (Hadoop FS — HDFS/S3A/local alike). */
  private def listDataFiles(): Seq[org.apache.hadoop.fs.FileStatus] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st) else Nil
      }
    if (fs.exists(root)) walk(root) else Seq.empty
  }

  /** Shared swap: write `df` to a hidden temp dataset, then hand the
    * directory replacement to [[graft.ops.Layout.swapInDirectory]] — the
    * ONE swap protocol, so Table and hive-partition maintenance share a
    * single crash-window definition and one healer recognizes both kinds
    * of litter. The bad window — between the two renames, where `path` is
    * briefly missing with the data intact in the hidden `.name.__old`
    * backup — is self-healed at entry here (and by any
    * `recoverInterruptedSwap` caller). `df` is by-name: its plan scans
    * `path`, so it must not be CONSTRUCTED (parquet schema resolution
    * lists the path eagerly) until after the heal. */
  private def healSwap(): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.Layout.recoverInterruptedSwap(fs, target)
  }

  private def swapInRewrite(df: => DataFrame): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal a previous compact's mid-swap crash BEFORE `df`'s plan is
    // constructed (parquet schema resolution lists `path` eagerly)
    healSwap()
    val tmp = new org.apache.hadoop.fs.Path(target.getParent,
      s".$name.__compacting")
    fs.delete(tmp, true) // stale temp from a previous crashed run
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    graft.ops.Layout.swapInDirectory(fs, target, tmp)
  }

  /** Copy this table to another name (reference `CopyTableOperator`,
    * operators/copy.py:7-17: `CREATE TABLE dst (LIKE src); INSERT ... SELECT`).
    * Schema travels with parquet; "INCLUDING indexes" has no analog — columnar
    * pruning and predicate pushdown replace btree indexes. */
  def copyTo(destination: String): Table = {
    val dst = Table(spark, dir, destination)
    dst.overwrite(read)
    dst
  }

  // ------------------------------------------------------------------
  // Versioned face — engine-level ownership of the read-version-N /
  // write-version-N+1 lifecycle the incremental operators (cdcApply,
  // SCD, cross-batch dedup state) need. Spark reads are LAZY: a plan
  // that references a directory must never have that directory
  // overwritten before the action runs, so in-place refresh of a table
  // a live plan references is inherently unsafe. Versioning solves it
  // structurally: every write lands in a FRESH immutable directory,
  // made visible by one atomic-ish rename (readers either see a
  // complete version or don't see it at all — the same
  // commit-by-rename contract [[compact]] uses for its swap). This is
  // the minimal core of what a table format's transaction log buys,
  // with the version id doubling as the time-travel handle.
  // ------------------------------------------------------------------

  /** Root of the versioned layout (sibling of the flat [[path]]). */
  def versionsRoot: String = s"$dir/$name.__v"

  /** Directory of one version; zero-padded so a lexical listing is also
    * the numeric order. */
  def versionPath(v: Long): String = f"$versionsRoot/v$v%012d.parquet"

  private def versionsFs = new org.apache.hadoop.fs.Path(versionsRoot)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** All committed versions, ascending. Metadata-only (one directory
    * listing — O(versions), never O(files)); incomplete writes (staging
    * dirs) are invisible because commit is the terminal rename. */
  def versions: Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(versionsRoot)
    val fs = versionsFs
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".parquet") =>
        n.stripPrefix("v").stripSuffix(".parquet") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .sorted
  }

  /** Highest committed version, if any. */
  def latestVersion: Option[Long] = versions.lastOption

  /** Commit `df` as the next version and return its id (0 for the first
    * write). The data is fully written to a hidden staging directory
    * first and then renamed into its version path — a reader never
    * observes a half-written version, and a crash leaves only staging
    * litter the next successful commit's readers ignore. Refuses to
    * overwrite an existing version: ids are immutable history. */
  def writeVersion(df: DataFrame): Long = {
    val v = latestVersion.fold(0L)(_ + 1L)
    val fs = versionsFs
    val target = new org.apache.hadoop.fs.Path(versionPath(v))
    require(!fs.exists(target),
      s"version $v of $name already exists — versions are immutable; " +
        "a concurrent writer won the commit race")
    val staging = new org.apache.hadoop.fs.Path(
      s"$versionsRoot/.staging-v$v-${java.util.UUID.randomUUID}")
    df.write.mode(SaveMode.ErrorIfExists).parquet(staging.toString)
    if (!fs.rename(staging, target)) {
      fs.delete(staging, true)
      throw new IllegalStateException(
        s"writeVersion: commit rename $staging -> $target failed " +
          "(concurrent writer?); staging cleaned up, history unchanged")
    }
    v
  }

  /** Idempotent commit for exactly-once micro-batch sinks: commit `df` as
    * version `v` unless `v` already exists, returning whether a write
    * happened. Structured Streaming's `foreachBatch` re-delivers a batch
    * after a restart with the SAME batchId; a sink that derives its
    * version id from the batchId (v = batchId + 1 over an initial
    * version 0) makes the re-delivery a no-op instead of a double-apply —
    * the same ledger trick every transactional sink plays with
    * (batchId, epoch) bookkeeping, here with the version directory itself
    * as the ledger (no second metadata store to drift from the data).
    * Requires `v` = latest + 1 when absent: version history must stay
    * gap-free or `versions`-based time travel lies. */
  def writeVersionIfAbsent(v: Long, df: => DataFrame): Boolean = {
    require(v >= 0, s"version must be >= 0, got $v")
    val latest = latestVersion
    if (latest.exists(_ >= v)) false
    else {
      require(v == latest.fold(0L)(_ + 1L),
        s"writeVersionIfAbsent($v) would leave a gap: latest is " +
          s"${latest.fold("none")(_.toString)}")
      writeVersion(df) == v || {
        throw new IllegalStateException(
          s"writeVersionIfAbsent($v): a concurrent writer moved the history")
      }
    }
  }

  /** Time-travel read of one committed version. The version directory is
    * immutable, so the returned lazy plan stays valid however many
    * versions land after it. */
  def readVersion(v: Long): DataFrame = {
    require(versions.contains(v),
      s"version $v of $name does not exist (have: ${versions.mkString(",")})")
    spark.read.parquet(versionPath(v))
  }

  /** Read the latest committed version. */
  def readLatest: DataFrame = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"$name has no committed versions"))
    spark.read.parquet(versionPath(v))
  }

  /** Retention: delete all but the newest `keepLast` versions, returning
    * the ids dropped. Refuses `keepLast < 1` — the live (latest) version
    * is never vacuumable; losing it would turn retention into data loss.
    * Deleting old versions invalidates any still-lazy plans over them —
    * retention is the caller's declaration that nothing references them
    * (the same contract as every table format's VACUUM). */
  def vacuum(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1,
      s"vacuum must keep at least the latest version, got keepLast=$keepLast")
    val all = versions
    val drop = all.dropRight(keepLast)
    val fs = versionsFs
    drop.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(versionPath(v)), true))
    drop
  }
}

/** Schema manipulation helpers — the reference's "dtype threading" idiom
  * (README.md:73-82, 102-122, 149-153) as StructType functions. */
object Schemas {

  /** Concatenate two schemas and drop duplicate names keeping the first —
    * the `merge_dtype` helper the reference README calls for join outputs
    * (README.md:150-151) but never defines; provided natively here. */
  def mergeDtype(a: StructType, b: StructType): StructType = {
    val seen = scala.collection.mutable.LinkedHashMap[String, StructField]()
    (a.fields ++ b.fields).foreach(f => if (!seen.contains(f.name)) seen(f.name) = f)
    StructType(seen.values.toSeq)
  }

  /** Keep a subset of fields, in the given order (README.md:106-110). */
  def keepDtype(s: StructType, names: Seq[String]): StructType =
    StructType(names.map(n => s(s.fieldIndex(n))))

  /** Schema equality modulo nullability and metadata — parquet append only
    * cares about names and types. */
  def normalize(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.sql))
}
