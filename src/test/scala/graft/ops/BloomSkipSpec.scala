package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Four single-file shards with disjoint key ranges. */
  private def writeShards(dataDir: String): Unit =
    Seq.tabulate(40)(i => (i.toLong, i.toLong / 10, s"row$i"))
      .toDF("k", "__shard", "payload")
      .repartition(1)
      .write.partitionBy("__shard").mode("overwrite").parquet(dataDir)

  test("bloom skip: point lookups prune files, zero false negatives (X119)") {
    val dataDir = tmp("bs-data")
    val manifestDir = tmp("bs-man")
    writeShards(dataDir)
    BloomSkip.build(spark, dataDir, manifestDir, "k", bits = 4096,
      hashes = 5, seed = "s-x119")
    // key 7 lives only in shard 0: at most shard 0 + false positives,
    // never fewer — and the fetched rows are exactly the equality match
    val (df, stats) = BloomSkip.prunedRead(spark, dataDir, manifestDir,
      Seq(7L))
    assert(stats.filesTotal == 4 && stats.filesKept >= 1, s"stats $stats")
    assert(df.select("k", "payload").as[(Long, String)].collect().toSeq ==
      Seq((7L, "row7")))
    // IN-list across two shards
    val (df2, stats2) = BloomSkip.prunedRead(spark, dataDir, manifestDir,
      Seq(7L, 23L))
    assert(stats2.filesKept >= 2)
    assert(df2.select("k").as[Long].collect().toSet == Set(7L, 23L))
    // absent key: possibly zero files; always zero rows
    val (df3, _) = BloomSkip.prunedRead(spark, dataDir, manifestDir,
      Seq(999L))
    assert(df3.count() == 0)
    // at the 4096-bit design point the single-shard probe should
    // actually SKIP most files (this is the operator's reason to exist)
    assert(stats.filesKept < stats.filesTotal,
      s"no pruning happened: $stats")
  }

  test("bloom skip: incremental refresh covers appends; stale reads refuse (X119)") {
    val dataDir = tmp("bs-data2")
    val manifestDir = tmp("bs-man2")
    writeShards(dataDir)
    BloomSkip.build(spark, dataDir, manifestDir, "k", bits = 4096,
      hashes = 5, seed = "s-x119")
    // append a fifth shard under the manifest's back: reads refuse
    Seq((100L, "row100")).toDF("k", "payload")
      .write.parquet(s"$dataDir/__shard=4")
    val e = intercept[IllegalArgumentException](
      BloomSkip.prunedRead(spark, dataDir, manifestDir, Seq(7L)))
    assert(e.getMessage.contains("not covered"))
    // incremental: 4 carried, 1 added, 0 dropped; then the new key hits
    assert(BloomSkip.buildIncremental(spark, dataDir, manifestDir) ==
      ((4, 1, 0)))
    val (df, stats) = BloomSkip.prunedRead(spark, dataDir, manifestDir,
      Seq(100L))
    assert(stats.filesTotal == 5)
    assert(df.select("payload").as[String].collect().toSeq == Seq("row100"))
    // vanished file: refuse, then rebuild drops it
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dataDir/__shard=4"), true)
    val e2 = intercept[IllegalArgumentException](
      BloomSkip.prunedRead(spark, dataDir, manifestDir, Seq(7L)))
    assert(e2.getMessage.contains("no longer present"))
    val (carried, added, dropped) =
      BloomSkip.buildIncremental(spark, dataDir, manifestDir)
    assert((carried, added, dropped) == ((4, 0, 1)))
    assert(BloomSkip.prunedRead(spark, dataDir, manifestDir, Seq(7L))
      ._1.count() == 1)
  }

  test("bloom skip: all-NULL-key file stays covered and prunes out (X119)") {
    val dataDir = tmp("bs-data3")
    val manifestDir = tmp("bs-man3")
    Seq((Some(1L), 0L), (Some(2L), 0L)).toDF("k", "__shard")
      .repartition(1).write.partitionBy("__shard")
      .mode("overwrite").parquet(dataDir)
    Seq[Option[Long]](None, None).toDF("k").coalesce(1)
      .write.parquet(s"$dataDir/__shard=1")
    BloomSkip.build(spark, dataDir, manifestDir, "k", bits = 1024,
      hashes = 3, seed = "s-null")
    // the sentinel keeps the NULL-only file in the covered set (no
    // staleness refusal) while the probe never keeps it
    val (df, stats) = BloomSkip.prunedRead(spark, dataDir, manifestDir,
      Seq(1L))
    assert(stats.filesTotal == 2)
    assert(df.select("k").as[Long].collect().toSeq == Seq(1L))
    // identity mismatch is structurally impossible: probes read the
    // recorded (bits, hashes, seed) back — there is no parameter to get
    // wrong — so the only remaining misuse is a missing manifest
    intercept[Exception](BloomSkip.prunedRead(spark, dataDir,
      tmp("bs-empty"), Seq(1L)))
  }
}
