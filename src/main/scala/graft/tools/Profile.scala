package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only per-stage profiler: times named sub-plans of the heavy queries so
  * regressions are attributed to a stage, not a query. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Profile"`. */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    spark.range(1000).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSet else Set("q27", "q37", "q40")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    if (names("q27")) time("q27 jaccard pairs") {
      noop(graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
        .orderBy("id_a", "id_b"))
    }
    if (names("stages")) {
      val pairs = time("  pairs materialize (count)") {
        val p = graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
          .localCheckpoint(true)
        p
      }
      val cc = time("  connectedComponents") {
        graft.dedup.Dedup.connectedComponents(pairs, docs, "doc_id")
      }
      time("  final join + noop") {
        noop(docs.join(cc.filter(col("doc_id") === col("component"))
          .select("doc_id"), "doc_id").select("doc_id", "lang", "source")
          .orderBy("doc_id"))
      }
    }
    if (names("q37")) time("q37 cc clusters") {
      val pairs = graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
      noop(graft.dedup.Dedup.connectedComponents(pairs, docs, "doc_id").orderBy("doc_id"))
    }
    if (names("q40")) time("q40 near dedup corpus") {
      val pairs = graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
      val clusters = graft.dedup.Dedup.connectedComponents(pairs, docs, "doc_id")
      noop(docs.join(clusters.filter(col("doc_id") === col("component"))
        .select("doc_id"), "doc_id").select("doc_id", "lang", "source")
        .orderBy("doc_id"))
    }
    spark.stop()
  }
}
