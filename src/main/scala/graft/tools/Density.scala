package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only DENSITY-ramp probe (VERDICT r14 ask #2's second half): the
  * SCALING study holds density constant by construction (disjoint
  * shards), so it measures VOLUME exponents only. This tool ramps the
  * three densities the candidate-cap knobs exist for and measures how
  * each operator approaches its cap:
  *
  *  - near-dup DUPLICATE RATE: a pool of 50 documents is re-keyed into
  *    the corpus `c` times, so those band buckets fill linearly in c and
  *    the candidate pairs grow ~ 50·c²/2 — the density quadratic
  *    `maxBucketSize` bounds. Measured uncapped (the approach) and with
  *    a binding cap (the knee: a logged deterministic drop, work
  *    flattened, never a failure).
  *  - IVF CELL FILL: a fraction f of embeddings is replaced by one fixed
  *    vector, collapsing f·N rows into one cell whose refine self-join
  *    is (f·N)² — `maxCellSize`'s reason. Same uncapped/capped pairing.
  *  - BASKET SIZE: lineitem baskets are item-multiplied ×m (disjoint
  *    part-key shifts), so pair fan-out grows m² — until `maxBasketSize`
  *    REFUSES (this knob refuses rather than degrades: a fat basket is
  *    an upstream modeling error, not a samplable nuisance). The refusal
  *    boundary is probed explicitly.
  *
  * Prints one JSON line per measurement:
  * `{"metric":"density","probe":...,"level":...,"sec":...,"rows":...,
  * "capped":...}`. Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Density"`. */
object Density {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def r3(v: Double): Double = math.round(v * 1000).toDouble / 1000
    def emit(probe: String, level: String, sec: Double, rows: Long,
        capped: Boolean): Unit =
      println(s"""{"metric":"density","probe":"$probe","level":"$level",""" +
        s""""sec":${r3(sec)},"rows":$rows,"capped":$capped}""")

    // ---------------- near-dup duplicate-rate ramp -------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .persist()
    val pool = docs.orderBy("doc_id").limit(50).persist()
    pool.count()
    def dupCorpus(copies: Int): DataFrame =
      if (copies == 0) docs
      else docs.unionByName(pool.crossJoin(
          spark.range(1, copies + 1).select(col("id").as("__c")))
        .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
          col("text")))
    Seq(0, 4, 8, 16, 32).foreach { c =>
      val (sec, rows) = timed(graft.dedup.Dedup.minHashLshPairs(
        dupCorpus(c), "doc_id", "text").count())
      emit("neardup_dup_rate", s"copies=$c", sec, rows, capped = false)
    }
    // the knee: a binding bucket cap flattens the quadratic to cap²
    // per bucket with a LOGGED drop — work bounded, run still succeeds
    val (secCap, rowsCap) = timed(graft.dedup.Dedup.minHashLshPairs(
      dupCorpus(32), "doc_id", "text", maxBucketSize = 8).count())
    emit("neardup_dup_rate", "copies=32", secCap, rowsCap, capped = true)
    pool.unpersist(); docs.unpersist()

    // ---------------- IVF cell-fill ramp -----------------------------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .persist()
    val first = emb.orderBy("vec_id").limit(1)
      .select("embedding").collect()(0).getSeq[Float](0)
    def cellCorpus(fPct: Int): DataFrame =
      emb.withColumn("embedding",
        when(pmod(col("vec_id"), lit(100)) < fPct, typedLit(first))
          .otherwise(col("embedding")))
    Seq(0, 10, 25, 50).foreach { f =>
      val (sec, rows) = timed(graft.sim.Similarity.semDedup(
        cellCorpus(f), "vec_id", "embedding", threshold = 0.99).count())
      emit("ivf_cell_fill", s"dup_pct=$f", sec, rows, capped = false)
    }
    val (secCell, rowsCell) = timed(graft.sim.Similarity.semDedup(
      cellCorpus(50), "vec_id", "embedding", threshold = 0.99,
      maxCellSize = 256).count())
    emit("ivf_cell_fill", "dup_pct=50", secCell, rowsCell, capped = true)
    emb.unpersist()

    // ---------------- basket-size ramp -------------------------------
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).persist()
    def baskets(mult: Int): DataFrame =
      (1 to mult).map(k => li.select(col("l_orderkey"),
        (col("l_partkey") + lit((k - 1) * 10000000L)).as("l_partkey")))
        .reduce(_ unionByName _)
    Seq(1, 2, 4, 8).foreach { m =>
      val (sec, rows) = timed(graft.ops.Associations.pairRules(
        baskets(m), col("l_orderkey"), col("l_partkey"),
        minSupportMicro = 200L).count())
      emit("basket_size", s"mult=$m", sec, rows, capped = false)
    }
    // the refusal boundary: X97 REFUSES fat baskets rather than degrade
    val refused = scala.util.Try(graft.ops.Associations.pairRules(
      baskets(8), col("l_orderkey"), col("l_partkey"),
      minSupportMicro = 200L, maxBasketSize = 16L).count())
    emit("basket_size", "mult=8,maxBasketSize=16",
      0.0, -1, capped = refused.isFailure)
    li.unpersist()
    spark.stop()
  }
}
