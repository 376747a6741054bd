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
      // UTC like Verify/Bench: events' tz-naive timestamps cast NTZ→TIMESTAMP
      .config("spark.sql.session.timeZone", "UTC")
      // keep catalog-registered staging tables (q149 writeBucketed) from
      // littering a spark-warehouse/ dir into the repo working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
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
    if (names("q24")) {
      import graft.text.TextStats
      // warm page cache + codegen before timing
      noop(docs.select(col("doc_id"), size(TextStats.tokens(col("text"))).as("n")))
      time("q24 fingerprints (arith count)") {
        noop(docs.select(col("doc_id"),
          TextStats.shingleCount(col("text"), 3).as("n_shingles"),
          size(TextStats.fingerprints(col("text"), 3)).as("n_distinct_shingles"))
          .withColumn("dup_ratio",
            round(lit(1.0) - col("n_distinct_shingles").cast("double") / col("n_shingles"), 6))
          .orderBy("doc_id"))
      }
      time("q24 fingerprints (old double assembly)") {
        noop(docs.select(col("doc_id"),
          size(TextStats.shingles(col("text"), 3)).as("n_shingles"),
          size(TextStats.fingerprints(col("text"), 3)).as("n_distinct_shingles"))
          .withColumn("dup_ratio",
            round(lit(1.0) - col("n_distinct_shingles").cast("double") / col("n_shingles"), 6))
          .orderBy("doc_id"))
      }
    }
    if (names("text")) {
      import graft.text.TextStats
      noop(docs.select(col("doc_id"), size(TextStats.tokens(col("text"))).as("n")))
      time("q41 tfidf (in-plan N)") {
        noop(TextStats.tfIdf(docs, "doc_id", "text")
          .orderBy(col("tfidf").desc, col("doc_id").asc, col("token").asc).limit(50))
      }
      time("q42 chunking") {
        noop(TextStats.chunk(docs, "doc_id", "text", 100, 20).orderBy("doc_id", "chunk_idx"))
      }
    }
    if (names("hamming")) {
      // hamming distance distribution of the exact Jaccard>=0.8 pairs
      val exact = graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
      val sigs = graft.dedup.Dedup.simHashes(docs, "doc_id", "text", 3)
      val ham = exact
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .select(col("jaccard"), bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("h"))
        .collect().map(r => (r.getDouble(0), r.getInt(1))).sortBy(_._1)
      println(s"[profile] (jaccard,hamming): " +
        ham.map { case (j, h) => f"($j%.3f,$h)" }.mkString(","))
      for (thr <- Seq(0.85, 0.9, 0.95)) {
        val qualifying = ham.filter(_._1 >= thr)
        println(f"[profile] j>=$thr: ${qualifying.size} pairs, maxHamming=" +
          s"${if (qualifying.isEmpty) "-" else qualifying.map(_._2).max}")
      }
    }
    if (names("recall")) {
      // does simhash Hamming<=3 blocking capture every exact Jaccard>=0.8 pair?
      val exact = graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sim = graft.dedup.Dedup.simHashNearDupPairs(docs, "doc_id", "text", 3, 0.8, 3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[profile] exact pairs=${exact.size} simhash-verified=${sim.size} " +
        s"equal=${exact == sim} missed=${(exact -- sim).size}")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val bf = graft.sim.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "query_id", "qvec", 10)
        .select("query_id", "neighbor_id", "sim", "rank").collect().map(_.toSeq).toSet
      val ivf = graft.sim.Similarity.ivfTopK(emb, "vec_id", "embedding", q, "query_id", "qvec",
          10, nCentroids = 16, nProbe = 16)
        .select("query_id", "neighbor_id", "sim", "rank").collect().map(_.toSeq).toSet
      println(s"[profile] ivf degenerate == brute force: ${bf == ivf} (${bf.size} rows)")
      val exactC = graft.sim.Similarity.cosinePairsExact(emb, "vec_id", "embedding", 0.45)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = graft.sim.Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.45, 16, 4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[profile] lsh subset=${lsh.subsetOf(exactC)} recall=${lsh.size}/${exactC.size}")
    }
    if (names("ccrounds")) {
      // replicate connectedComponents with per-phase timing to attribute cost
      val pairs = graft.dedup.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
        .localCheckpoint(true)
      val id = "doc_id"
      val p = time("  p persist+count") {
        val x = pairs.select(col("id_a"), col("id_b")).persist(); x.count(); x
      }
      val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(p.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct().persist()
      val edgeNodes = edges.select(col("src").as(id)).distinct()
      var labels = edgeNodes.select(col(id), col(id).as("component"))
      var converged = false
      var i = 0
      while (!converged && i < 10) {
        time(s"  round $i") {
          val fromNeighbors = edges
            .join(labels.select(col(id).as("dst"), col("component")), "dst")
            .groupBy(col("src").as(id))
            .agg(min(col("component")).as("nbr_component"))
          val next = labels
            .join(fromNeighbors, Seq(id), "left")
            .select(col(id),
              least(col("component"), coalesce(col("nbr_component"), col("component")))
                .as("component"),
              (col("nbr_component").isNotNull && col("nbr_component") < col("component"))
                .as("__changed"))
            .localCheckpoint(false)
          val changed = next.filter(col("__changed")).count()
          labels = next.drop("__changed")
          converged = changed == 0
          i += 1
        }
      }
      time("  singletons + final checkpoint") {
        val singletons = docs.select(col(id))
          .join(edgeNodes, Seq(id), "left_anti")
          .select(col(id), col(id).as("component"))
        labels.unionAll(singletons).localCheckpoint(true)
      }
    }
    // generic mode: `Profile entry:q29_simhash_pairs [entry:q84_fuzzy_join ...]`
    // runs any SparkEntry query warm, twice, so a bench spike can be
    // attributed to the query vs the box without editing this file
    names.filter(_.startsWith("entry:")).toSeq.sorted.foreach { spec =>
      val q = spec.stripPrefix("entry:")
      val fn = graft.SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q; names are SparkEntry.queries keys"))
      time(s"$q (cold)") { noop(fn(spark, sfDir)) }
      graft.queries.Artifacts.clear()
      time(s"$q (warm)") { noop(fn(spark, sfDir)) }
    }
    if (names("apriori")) {
      // stage breakdown of the q255 triple-rule pipeline
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val part = spark.read.parquet(s"$sfDir/part.parquet")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val baskets = li
        .join(part.select(col("p_partkey").as("l_partkey"), col("p_brand")),
          "l_partkey")
        .join(orders.filter(year(col("o_orderdate").cast("date")) === 1995)
          .select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
      val b = time("  b distinct+ckpt") {
        baskets.select(col("l_orderkey").as("__b"),
            col("p_brand").cast("string").as("__i"))
          .filter(col("__b").isNotNull && col("__i").isNotNull)
          .distinct().localCheckpoint(true)
      }
      time("  b count")(println(s"    b rows = ${b.count()}"))
      val s1 = graft.ops.Associations.pairRules(b, col("__b"), col("__i"), 2500L)
      time("  stage1 construct+consume")(noop(s1))
      time("  full tripleRules")(noop(graft.ops.Associations.tripleRules(
        baskets, col("l_orderkey"), col("p_brand"), 2500L)))
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
    // q305 stage decomposition (the SCALING.md round-17 open item):
    // which stage of the JW fuzzy join is flat between sf1 and sf3?
    if (names("q305")) {
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      val nm = substring(md5(concat(lit("jw:"),
        col("c_custkey").cast("string"))), 1, 12)
      val orig = c.select(col("c_custkey").as("id"), nm.as("nm"))
      val dup = c.filter(pmod(col("c_custkey"), lit(4)) === 0)
        .select((col("c_custkey") + 10000000L).as("id"),
          concat(substring(nm, 1, 6), substring(nm, 8, 1),
            substring(nm, 7, 1), substring(nm, 9, 4)).as("nm"))
      val reg = orig.unionByName(dup)
      time("  reg build (count)") { reg.count() }
      // replicate deletionVariants (private in FuzzyJoin) for staging
      def deleteOne(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(length(v) === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(v)), i =>
            concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v) - i))))
      val base = reg.select(col("id").as("__id"), col("nm").as("__s"))
        .withColumn("__v", col("__s"))
      val levels = (1 to 2).scanLeft(base) { (prev, _) =>
        prev.select(col("__id"), col("__s"),
          explode(deleteOne(col("__v"))).as("__v"))
      }
      val variants = levels.reduce(_ unionByName _).distinct()
      val nv = time("  variant explode + distinct (count)") { variants.count() }
      println(s"[profile]   variants = $nv")
      val vp = variants.persist()
      vp.count()
      val lv = vp.select(col("__id").as("__lid"), col("__s").as("__ls"), col("__v"))
      val rv = vp.select(col("__id").as("__rid"), col("__s").as("__rs"), col("__v"))
      val cand = lv.join(rv, "__v")
        .select(col("__lid"), col("__ls"), col("__rid"), col("__rs"))
      val rawPairs = time("  variant join (count, pre-distinct)") { cand.count() }
      println(s"[profile]   raw candidate rows = $rawPairs")
      val dPairs = time("  candidate distinct (count)") { cand.distinct().count() }
      println(s"[profile]   distinct candidates = $dPairs")
      vp.unpersist()
      (1 to 4).foreach { i =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        time(s"  full fuzzyJoinJw run $i (noop)") {
          noop(graft.ops.FuzzyJoin.fuzzyJoinJw(reg, "id", "nm",
            reg, "id", "nm", maxDist = 2, minJwMicro = 950000L))
        }
        val after = spark.sparkContext.getPersistentRDDs
        val delta = after.keySet -- before
        println(s"[profile]   run $i cache-RDD delta = ${delta.size}, " +
          s"total persistent = ${after.size}")
        delta.foreach(id => after(id).unpersist(blocking = true))
        if (i == 3) {
          println("[profile]   clearing CacheManager before run 4")
          spark.sharedState.cacheManager.clearCache()
        }
      }
    }
    spark.stop()
  }
}
