package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{count, lit}

/** Per-round lineage truncation for iterative operators (PageRank,
  * connected components, any loop whose round-N plan would otherwise
  * replay rounds 1..N−1).
  *
  * Two strategies, caller-selected via `reliableDir`:
  *
  *  - `None` → `localCheckpoint`: partitions persist in executor
  *    block-manager storage. Zero extra IO — the right default on
  *    `local[n]` and on clusters where a rare executor loss may
  *    acceptably fail the job (the lineage is GONE; Spark cannot
  *    recompute a lost block). The partitions are PINNED to the
  *    executors holding them, so dynamic allocation must not reap them
  *    mid-loop.
  *  - `Some(dir)` → reliable `checkpoint` into `dir` (HDFS/S3A/local):
  *    partitions are written to fault-tolerant storage, so an executor
  *    loss recomputes nothing and kills nothing — the multi-node
  *    production setting the operators' scaladocs tell callers to
  *    prefer. Costs one write+read of the frame per round; round frames
  *    in these operators are node-sized (never corpus-sized), so the IO
  *    is the cheap insurance, not a second shuffle.
  *
  * Both strategies truncate identically — the returned frame's plan is a
  * scan of materialized partitions, not the loop's join chain
  * (CheckpointingSpec pins that, and that both modes produce identical
  * results). `eager` mirrors the Dataset API: eager materializes now;
  * lazy defers to the caller's next action (the one-job-per-round
  * pattern where a convergence count doubles as the materializer).
  *
  * The checkpoint dir is SparkContext-global; this sets it only when this
  * helper hasn't already set the SAME dir for the context. The
  * already-set test cannot read the context back: `setCheckpointDir`
  * stores a fs-qualified per-CALL random UUID subdirectory of the given
  * dir, so `getCheckpointDir` never equals the caller's string — a
  * read-back comparison re-sets every round, paying a mkdirs round-trip
  * per iteration and scattering each round into a fresh UUID dir. The
  * last dir set is cached here instead. Files accumulate for the
  * session — callers owning `dir` should clean it after the loop (Spark
  * only auto-cleans with
  * `spark.cleaner.referenceTracking.cleanCheckpoints`, off by default).
  *
  * Concurrency contract: the check-and-set runs inside
  * `ConcurrentHashMap.compute`, so two loops truncating concurrently with
  * DIFFERENT reliableDirs serialize — each `df.checkpoint` that follows
  * still races the other loop's re-set (the context holds ONE global dir),
  * which is inherent to SparkContext's API, but the cache itself can no
  * longer desync from what this helper last set. Callers that invoke
  * `sc.setCheckpointDir` DIRECTLY invalidate the cache (this helper cannot
  * observe the call — see the UUID note above): don't mix direct sets with
  * this helper on the same context, or the next truncate may land
  * checkpoints in the foreign dir. Running two reliable-dir loops on one
  * context simultaneously is likewise caller error — same global knob. */
object Checkpointing {

  // last dir THIS helper set, per context (a stopped context's entry is
  // dead weight measured in one map entry — not worth a lifecycle hook)
  private val lastSet =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]()

  def truncate(df: DataFrame, eager: Boolean,
      reliableDir: Option[String]): DataFrame = reliableDir match {
    case None => df.localCheckpoint(eager)
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // atomic per-context check-and-set: compute holds the bin lock, so a
      // concurrent truncate with another dir cannot interleave between the
      // read and the setCheckpointDir+cache write
      lastSet.compute(sc, (_, prev) => {
        if (prev != dir) sc.setCheckpointDir(dir)
        dir
      })
      df.checkpoint(eager)
  }

  /** [[truncate]] + a bounded probe in ONE Spark job: truncates `df` and
    * runs the given aggregation over the truncated frame, returning both.
    * The iterative operators all pair an eager per-round truncation with a
    * termination/budget probe (`isEmpty`, a count, a corruption flag) over
    * the frame the truncation just materialized — two driver round-trips
    * per round for one frame. In the localCheckpoint mode the checkpoint
    * is marked LAZILY and the probe aggregation is the materializing
    * action (an aggregate computes every partition, so the checkpoint is
    * complete when it returns — the same guarantee eager's internal
    * count() gives); in the reliable mode the write barrier stays its own
    * job (the checkpoint IS a job there) and the probe scans the written
    * partitions, so results are identical in both modes and the fold only
    * changes how many jobs a round costs, never what it computes. */
  def truncateProbe(df: DataFrame, reliableDir: Option[String],
      aggs: Seq[Column]): (DataFrame, Row) = {
    require(aggs.nonEmpty, "truncateProbe needs at least one aggregate")
    val out = reliableDir match {
      case None    => df.localCheckpoint(false)
      case Some(_) => truncate(df, eager = true, reliableDir)
    }
    (out, out.agg(aggs.head, aggs.tail: _*).collect()(0))
  }

  /** [[truncateProbe]] specialized to the row count — the BFS/peel loops'
    * exhaustion test, folded into the materialization job. */
  def truncateCount(df: DataFrame,
      reliableDir: Option[String]): (DataFrame, Long) = {
    val (out, row) = truncateProbe(df, reliableDir, Seq(count(lit(1))))
    (out, row.getLong(0))
  }
}
