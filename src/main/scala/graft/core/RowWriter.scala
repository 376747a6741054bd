package graft.core

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Buffered row sink: accumulates rows and bulk-appends every `chunkSize`
  * (reference `PostgresDatasetWriter`, data_preparation_plugin/hooks/dataset.py:13-47 —
  * buffered INSERTs with a context-manager flush on exit).
  *
  * Spark-native note: this exists for API parity and driver-side trickle
  * ingest only. Real data volume goes through `Table.append` where the
  * parquet writer does its own buffering, distributed. A row-at-a-time path
  * through the driver can never be the 100 TB path.
  */
final class RowWriter(table: Table, dtype: StructType, chunkSize: Int = 1000)
    extends AutoCloseable {
  require(chunkSize > 0, "chunkSize must be positive")

  private val buf = new ArrayBuffer[Row](chunkSize)
  private var written = 0L

  /** Buffer one row; flush when the buffer reaches `chunkSize`
    * (dataset.py:43-47). */
  def writeRow(row: Row): Unit = {
    buf += row
    if (buf.size >= chunkSize) flush()
  }

  /** Convenience mirroring the reference's `write_row_dict`. */
  def writeRowMap(values: Map[String, Any]): Unit =
    writeRow(Row.fromSeq(dtype.fieldNames.toSeq.map(values.getOrElse(_, null))))

  // Cheap metadata-only existence probe of the table root, scheme-aware
  // (HDFS/S3A/local alike) — used to distinguish "no table yet" from "table
  // present but a file inside it vanished mid-read".
  private def rootExists(): Boolean = {
    val p = new org.apache.hadoop.fs.Path(table.path)
    p.getFileSystem(table.spark.sessionState.newHadoopConf()).exists(p)
  }

  // The rename-aside backup a concurrent compact holds mid-swap (the ONE
  // moment the root is legitimately missing for an EXISTING table) —
  // naming owned by Layout.swapInDirectory.
  private def swapBackupExists(): Boolean = {
    val p = new org.apache.hadoop.fs.Path(table.path)
    val backup = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.__old")
    p.getFileSystem(table.spark.sessionState.newHadoopConf()).exists(backup)
  }

  // If the table already exists, its schema must match `dtype` — otherwise
  // appended part files would carry a different schema in the same directory
  // and reads would silently drop/mis-type columns. Checked once, lazily
  // (the table may legitimately not exist yet on first flush).
  private lazy val schemaChecked: Unit = {
    // Only a MISSING table skips the check. Swallowing every failure (the
    // previous Try(...).toOption) would let a transient read error disable
    // the one guard that keeps mixed-schema part files out of the directory.
    val existing =
      try Some(table.schema)
      catch {
        // Waive only when the root is STILL absent at probe time, exactly
        // like the FNF branch below: a concurrent compact that completed
        // its swap between the failed read and this probe (backup already
        // deleted, root restored) means the table exists — rethrow so an
        // existing table never takes a mismatched-dtype append.
        case e: org.apache.spark.sql.AnalysisException
            if (e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist")) &&
              !rootExists() && !swapBackupExists() => None
        // Spark doesn't always wrap a missing path in AnalysisException:
        // depending on which resolution path runs first (file-index listing
        // vs schema inference), a raw Hadoop FileNotFoundException can
        // surface instead — observed once under a concurrently-loaded box.
        // But an FNF in the cause chain is only "no table yet" when the
        // table ROOT itself is absent: an FNF on a part file INSIDE an
        // existing directory (e.g. files swapped out from under the read by
        // a concurrent Table.compact) is a real race, and skipping the
        // schema guard for it would re-open the guard-bypass the old
        // Try(...).toOption created. Confirm root absence before waiving —
        // AND that no mid-swap backup sits beside it: during a concurrent
        // compact's rename-aside window the root is briefly missing while
        // the table logically exists in `.name.__old`, so "root absent"
        // alone would still waive the guard for a table that is merely
        // mid-swap. A backup present means the table exists: rethrow.
        case e: Throwable
            if Iterator.iterate(e.asInstanceOf[Throwable])(_.getCause)
              .takeWhile(_ != null).take(8)
              .exists(_.isInstanceOf[java.io.FileNotFoundException]) &&
              !rootExists() && !swapBackupExists() => None
      }
    existing.foreach { s =>
      require(Schemas.normalize(s) == Schemas.normalize(dtype),
        s"RowWriter dtype does not match existing table ${table.name}:\n" +
          s"  table: ${Schemas.normalize(s)}\n  dtype: ${Schemas.normalize(dtype)}")
    }
  }

  /** Bulk-append the buffer (dataset.py:30-41). */
  def flush(): Unit = if (buf.nonEmpty) {
    schemaChecked
    val df = table.spark.createDataFrame(buf.toList.asJava, dtype)
    df.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(table.path)
    written += buf.size
    buf.clear()
  }

  def rowsWritten: Long = written + buf.size

  /** Context-manager flush on exit (dataset.py:27-28). */
  override def close(): Unit = flush()
}
