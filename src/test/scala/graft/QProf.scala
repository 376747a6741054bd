package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time individual registered queries standalone
  * (cold artifacts), outside Bench's chunked scheduling — the tool for
  * attributing a slow bench line to the stage that actually pays (shared
  * [[graft.queries.Artifacts]] builds land on whichever consumer runs
  * first, so Bench timings alone can misattribute).
  *
  *   sbt "Test/runMain graft.QProf /root/testdata/sf0.1 q135_cluster_safe_split"
  *
  * Ordering is the profile: listing a chain (q27 q37 q135) shows each
  * query's marginal cost over the artifacts its predecessors built.
  * Parallelism follows SPARK_GRAFT_CPUS (Bench's knob), default 32. */
object QProf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QProf <sfDir> <queryName>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("qprof-wh").toString)
      .appName("qprof").getOrCreate()
    val registry = graft.queries.Relational.queries ++ graft.queries.LlmOps.queries
    val unknown = args.drop(1).filterNot(n => registry.exists(_.name == n))
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — names are q<N>_<slug>")
    for (name <- args.drop(1)) {
      val q = registry.find(_.name == name).get
      val t0 = System.nanoTime
      val n = q.fn(spark, args(0)).count()
      println(f"PROF $name: ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
