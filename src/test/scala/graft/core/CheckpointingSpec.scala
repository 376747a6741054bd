package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.ops.Graph

/** Pins the reliable-checkpoint knob of the iterative operators: both
  * truncation strategies yield bit-identical results, lineage is actually
  * cut (the returned plan is a scan of materialized partitions, not the
  * loop's join chain), and the reliable mode really lands files in the
  * caller's directory (the fault-tolerance it exists to buy). */
class CheckpointingSpec extends SparkSpec {
  import spark.implicits._

  private def reliableDir() =
    java.nio.file.Files.createTempDirectory("graft-ckpt").toString

  test("truncate cuts lineage in both modes") {
    val base = (1L to 100L).toDF("x")
    val chained = (1 to 5).foldLeft(base)((df, i) =>
      df.withColumn("x", col("x") + i).groupBy("x").count().select("x"))
    assert(chained.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    val local = Checkpointing.truncate(chained, eager = true, None)
    assert(!local.queryExecution.optimizedPlan.toString.contains("Aggregate"),
      "localCheckpoint left the join/agg chain in the plan")
    val dir = reliableDir()
    val rel = Checkpointing.truncate(chained, eager = true, Some(dir))
    assert(!rel.queryExecution.optimizedPlan.toString.contains("Aggregate"),
      "reliable checkpoint left the join/agg chain in the plan")
    // reliable mode wrote real checkpoint state to the caller's dir
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(new java.io.File(dir)).nonEmpty,
      "reliable checkpoint landed no files in the checkpoint dir")
    assert(local.as[Long].collect().sorted.toSeq ==
      rel.as[Long].collect().sorted.toSeq)
  }

  test("pageRank: reliable checkpoint == localCheckpoint, bit-identical (q132 fixture)") {
    val edges = ((1L to 5L).map(_ -> 6L) :+ (6L -> 1L)).toDF("src", "dst")
    val local = Graph.pageRank(edges, iterations = 8)
      .as[(Long, Long)].collect().toMap
    val rel = Graph.pageRank(edges, iterations = 8,
        checkpointDir = Some(reliableDir()))
      .as[(Long, Long)].collect().toMap
    assert(rel == local)
  }

  test("connectedComponents + star: reliable == local (q37 fixture shape)") {
    // two chains and a singleton — enough rounds to exercise truncation
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val nodes = (1L to 12L).toDF("id")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L) ++ (5L to 9L).map(i => i -> i) ++ Seq(12L -> 12L)
    assert(asMap(Dedup.connectedComponents(pairs, nodes, "id")) == expected)
    assert(asMap(Dedup.connectedComponents(pairs, nodes, "id",
      checkpointDir = Some(reliableDir()))) == expected)
    assert(asMap(Dedup.connectedComponentsStar(pairs, nodes, "id")) == expected)
    assert(asMap(Dedup.connectedComponentsStar(pairs, nodes, "id",
      checkpointDir = Some(reliableDir()))) == expected)
  }
}
