package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog sleeping by the door"),
    (2L, "the quick brown fox jumps over the lazy dog sleeping by the gate"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer internals here now"),
    (4L, "the quick brown fox jumps over the lazy dog sleeping by the door"), // exact dup of 1
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps the lowest id per duplicate group (X1)") {
    val out = Dedup.exactKeepFirst(docs, Seq("text"), col("doc_id"))
    assert(out.count() == 4)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 5L))
  }

  test("jaccardSimilarityJoin finds exact and near duplicates (X2a)") {
    val pairs = Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical => jaccard 1.0
    assert(pairs.contains((1L, 2L))) // one word differs
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentJoinOnSets finds directed quote-inclusion Jaccard misses (X2f)") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // 2 trigrams, both inside doc 2
      (2L, "intro words alpha beta gamma delta and then a very long tail " +
        "of unrelated filler content continues for many more tokens here"),
      (3L, "alpha beta gamma epsilon"), // shares 1 of its 2 trigrams with 1
      (4L, "zz") // < n tokens: empty shingle set, must never pair
    ).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(corpus, "doc_id", "text", n = 3)
    val out = Dedup.containmentJoinOnSets(sets, "doc_id", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2)).toSet
    // 1 ⊂ 2 at containment 1.0; the reverse direction is nowhere near 0.9
    assert(pairs.contains((1L, 2L)), s"missed containment: ${out.toSeq}")
    assert(!pairs.contains((2L, 1L)))
    assert(out.collect { case (1L, 2L, c) => c }.head == 1.0)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // jaccard at the same threshold misses the quote inclusion entirely
    val jac = Dedup.jaccardSimilarityJoinOnSets(sets, "doc_id", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)))
    // at 0.5, doc 3 (1 of 2 trigrams shared) is contained in 1 and vice versa
    val loose = Dedup.containmentJoinOnSets(sets, "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose.contains((3L, 1L)) && loose.contains((1L, 3L)))
    intercept[IllegalArgumentException](
      Dedup.containmentJoinOnSets(sets, "doc_id", threshold = 0.0))
  }

  test("incrementalNearDupNew drops batch docs near-duplicating history (X35)") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog sleeping by the door"),
      (2L, "completely different words about spark catalyst optimizer internals here now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog sleeping by the gate"), // ~hist 1
      (11L, "the quick brown fox jumps over the lazy dog sleeping by the door"), // = hist 1
      (12L, "entirely novel content nothing like anything seen before today"),
      (13L, "entirely novel content nothing like anything seen before today") // dup of 12, NOT of history
    ).toDF("doc_id", "text")
    val hSets = Dedup.shingleSets(history, "doc_id", "text", n = 3)
    val bSets = Dedup.shingleSets(batch, "doc_id", "text", n = 3)
    val out = Dedup.incrementalNearDupNew(bSets,
        Dedup.nearDupBandKeys(hSets, "doc_id"), hSets, "doc_id",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // 10/11 match history; 12 is new; 13 duplicates 10 but NOT history —
    // this pass is strictly batch-vs-history, so 13 survives (intra-batch
    // dedup is minHashLshPairs' job)
    assert(out == Set(12L, 13L), s"wrong survivors: $out")
    // agrees with the exact bipartite contamination join at the same
    // threshold (LSH recall is total on near-identical text)
    val exact = Dedup.jaccardContamination(batch, history, "doc_id", "doc_id",
        "text", "text", n = 3, threshold = 0.5)
      .select("id_l").as[Long].collect().toSet
    assert(out == Set(10L, 11L, 12L, 13L) -- exact)
    intercept[IllegalArgumentException](
      Dedup.incrementalNearDupNew(bSets, Dedup.nearDupBandKeys(hSets, "doc_id"),
        hSets, "doc_id", threshold = 0.0))
  }

  test("containment prefix filter loses nothing vs the brute-force join") {
    // adversarial sizes: short docs contained in long ones, shared rare and
    // common shingles — the one-sided prefix must still catch every pair
    val corpus = (1L to 24L).map { i =>
      val base = (0 until (3 + (i % 5).toInt))
        .map(j => s"tok${(i * 7 + j * 11) % 13}").mkString(" ")
      val quoted = if (i % 3 == 0) " common alpha beta run" else ""
      (i, base + quoted)
    }.toDF("doc_id", "text")
    val sets = Dedup.shingleSets(corpus, "doc_id", "text", n = 2)
    val fast = Dedup.containmentJoinOnSets(sets, "doc_id", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val brute = a.crossJoin(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") =!= col("id_b"))
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
        / size(col("sh_a")) >= 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == brute, s"prefix filter diverged: missing=${brute -- fast} extra=${fast -- brute}")
  }

  test("minHashLshPairs reproduces the exact jaccard pair set (X2b)") {
    val exact = Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        bands = 32, rowsPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simHash: identical docs collide, near-dups are close, distinct far (X2c)") {
    val sigs = docs.select(col("doc_id"), Dedup.simHash(col("text"), 3).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }

  test("connectedComponents labels duplicate clusters with the min id (X2)") {
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 9L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 7L, 9L).toDF("doc_id")
    val comp = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents converges on a chain longer than one hop") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val comp = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
  }

  test("connectedComponentsStar matches propagation on clusters + singletons (X40)") {
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 9L), (9L, 7L), (4L, 4L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 7L, 9L).toDF("doc_id")
    val comp = Dedup.connectedComponentsStar(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponentsStar collapses a diameter-64 chain in O(log) rounds (X40)") {
    // 65-node path: min-label propagation needs 64 rounds (it would THROW at
    // its default cap of 10); star contraction converges inside a small
    // logarithmic budget — the scale property the algorithm exists for
    val pairs = (1L to 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 65L).toDF("doc_id")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(pairs, nodes, "doc_id").count()
    }
    val comp = Dedup.connectedComponentsStar(pairs, nodes, "doc_id", maxIterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 65 && comp.values.toSet == Set(1L))
  }

  test("connectedComponentsStar equals propagation truth on a random graph (X40)") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(70)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
    val pairs = edges.toDF("id_a", "id_b")
    val nodes = (1L to n.toLong).toDF("doc_id")
    val star = Dedup.connectedComponentsStar(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.connectedComponents(pairs, nodes, "doc_id", maxIterations = 64)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("connectedComponentsStar with no edges labels every node itself (X40)") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val nodes = Seq(5L, 6L).toDF("doc_id")
    val comp = Dedup.connectedComponentsStar(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(5L -> 5L, 6L -> 6L))
  }

  test("simHashPairs finds identical-signature pairs via quarter blocking") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", n = 3, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("jaccardContamination finds cross-corpus near-dups, bipartite only") {
    // 1 and 2 are near-dups of EACH OTHER (left-left) — a real bipartite
    // join must not emit that pair even though it clears the threshold
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dogs"),
      (3L, "an exact copy of benchmark item one entirely"),
      (4L, "completely unrelated text about spark plans")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1, 2
      (11L, "an exact copy of benchmark item one entirely") // exact dup of 3
    ).toDF("doc_id", "text")
    val hits = Dedup.jaccardContamination(train, bench, "doc_id", "doc_id",
        "text", "text", n = 3, threshold = 0.6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 10L), (2L, 10L), (3L, 11L)))
    // in particular: no (1,2) left-left pair, no right-right pairs
  }

  test("ngramCollisionContamination flags any shared n-gram, counts distinct hits") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares 4-grams with bench 10
      (2L, "alpha beta gamma unrelated tail words"), // shares exactly one 3-gram prefix
      (3L, "completely different content here now"), // clean
      (4L, "x alpha beta gamma delta y")             // shares interior grams
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "nothing matching at all whatsoever")
    ).toDF("doc_id", "text")
    val hits = Dedup.ngramCollisionContamination(
        train, "doc_id", "text", bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // bench 3-grams of 10: {abg, bgd, gde}; train 1 hits all 3, train 2
    // hits only "alpha beta gamma", train 4 hits {abg, bgd} (its "gamma
    // delta y" gram differs from the bench's "gamma delta epsilon")
    assert(hits == Map(1L -> 3L, 2L -> 1L, 4L -> 2L))
    // at n = 13 nothing here is long enough to collide
    assert(Dedup.ngramCollisionContamination(
      train, "doc_id", "text", bench, "doc_id", "text", n = 13).count() == 0)
    // n = 0 would collapse every doc onto the empty gram (universal
    // contamination) — rejected up front
    intercept[IllegalArgumentException](Dedup.ngramCollisionContamination(
      train, "doc_id", "text", bench, "doc_id", "text", n = 0))
  }

  test("simHashPairsOnSigs at maxHamming=0 equals the quarter path's 0-distance set") {
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val sigs = Dedup.simHashesOnSets(sets, "doc_id")
    val full = Dedup.simHashPairsOnSigs(sigs, "doc_id", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val quarter = Dedup.simHashPairsOnSigs(sigs, "doc_id", maxHamming = 3)
      .filter(col("hamming") === 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full == quarter && full.contains((1L, 4L)))
    // the 0-distance fast path must not explode quarters (the shingle
    // explode inside the signature aggregation is legitimate): single
    // keyed join on the full signature
    val plan = Dedup.simHashPairsOnSigs(sigs, "doc_id", 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("posexplode"),
      s"maxHamming=0 should not explode quarter blocks:\n$plan")
    // out-of-range distances fail fast instead of silently returning empty
    intercept[IllegalArgumentException](
      Dedup.simHashPairsOnSigs(sigs, "doc_id", maxHamming = -1))
    intercept[IllegalArgumentException](
      Dedup.simHashPairsOnSigs(sigs, "doc_id", maxHamming = 4))
  }

  test("simHashNearDupPairs: verified output, guaranteed recall at j=1 (q29)") {
    // verified form never emits a pair below the Jaccard threshold…
    val verified = Dedup.simHashNearDupPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxHamming = 3)
      .select("jaccard").as[Double].collect()
    assert(verified.forall(_ >= 0.8))
    // …and at (threshold=1, maxHamming=0) recall is 1 by construction:
    // identical shingle sets ⇒ identical simhash ⇒ Hamming 0 ⇒ candidate.
    // Double the corpus under shifted ids so every doc has a j=1 twin.
    val doubled = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 100))
    val exactTwins = Dedup.simHashNearDupPairs(doubled, "doc_id", "text",
        n = 3, threshold = 1.0, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ids = docs.select("doc_id").as[Long].collect().toSet
    // docs 1 and 4 are identical text → their twins cross-pair too
    assert(ids.forall(i => exactTwins.contains((i, i + 100))))
    assert(exactTwins.forall { case (a, b) => a != b })
  }

  test("dedupLines keeps first (id, pos) occurrence and reassembles docs (X1b)") {
    val multi = Seq(
      (1L, "alpha unique\nshared footer\nbeta unique"),
      (2L, "gamma unique\nshared footer\ndelta unique"),
      (3L, "shared footer")                           // nothing survives
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha unique\nshared footer\nbeta unique"), // first occurrence keeps it
      (2L, "gamma unique\ndelta unique"),               // footer removed, order kept
      (3L, "")))                                        // fully-boilerplate doc survives empty
    // a line repeated INSIDE one document also collapses to its first position
    val self = Seq((1L, "x\ny\nx")).toDF("doc_id", "text")
    assert(Dedup.dedupLines(self, "doc_id", "text")
      .as[(Long, String)].head()._2 == "x\ny")
    // blank lines are STRUCTURE, not boilerplate: every doc keeps its
    // paragraph separators even though doc 1's blank line "occurred first"
    val paras = Seq((1L, "a\n\nb"), (2L, "c\n\nd")).toDF("doc_id", "text")
    assert(Dedup.dedupLines(paras, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a\n\nb"), (2L, "c\n\nd")))
  }

  test("minHashLshPairs bucket cap bounds a planted mega-duplicate class") {
    // 200 identical docs — every band puts all 200 in ONE bucket, so the
    // uncapped candidate join would emit 200·199/2 = 19900 pairs; with the
    // cap at 10 per bucket, candidates are bounded at 10·9/2 = 45 and the
    // kept members are the smallest ids (deterministic sample)
    val mega = (1L to 200L).map(i => (i, "same boilerplate text repeated over and over again"))
      .toDF("doc_id", "text")
    val capped = Dedup.minHashLshPairs(mega, "doc_id", "text", n = 3,
        threshold = 0.8, bands = 4, rowsPerBand = 4, maxBucketSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.nonEmpty, "cap must not erase the duplicate class entirely")
    assert(capped.size <= 45, s"candidates not bounded: ${capped.size}")
    // survivors are drawn from the 10 smallest ids in each (identical) bucket
    assert(capped.forall { case (a, b) => a <= 10 && b <= 10 })
    // a mixed corpus with a mega-class still finds pairs among OTHER docs
    val mixed = mega.unionAll(Seq(
      (1001L, "the quick brown fox jumps over the lazy dog sleeping by the door"),
      (1002L, "the quick brown fox jumps over the lazy dog sleeping by the gate")
    ).toDF("doc_id", "text"))
    val pairs = Dedup.minHashLshPairs(mixed, "doc_id", "text", n = 3,
        threshold = 0.5, bands = 32, rowsPerBand = 4, maxBucketSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1001L, 1002L)))
  }

  test("cosinePairsLsh bucket cap bounds identical-embedding classes") {
    val mega = (1L to 100L).map(i => (i, Seq(0.6f, 0.8f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val capped = graft.sim.Similarity.cosinePairsLsh(mega, "vec_id", "embedding",
        threshold = 0.99, bands = 4, rowsPerBand = 4, maxBucketSize = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.nonEmpty)
    assert(capped.size <= 8 * 7 / 2, s"candidates not bounded: ${capped.size}")
    assert(capped.forall { case (a, b) => a <= 8 && b <= 8 })
  }

  test("duplicatedSpanStats scores per-doc duplicated n-gram fractions (X2e)") {
    // docs 1 and 2 share their first three words (one shared 3-gram);
    // doc 3 shares nothing
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota")
    ).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs, "doc_id", "text", n = 3)
    val got = Dedup.duplicatedSpanStats(sets, "doc_id")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // each doc has two distinct 3-grams; "alpha beta gamma" recurs
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("duplicatedSpanStats: exact duplicates score 1.0") {
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"),
      (3L, "six seven eight nine ten")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanStats(
        Dedup.shingleSets(docs, "doc_id", "text", n = 3), "doc_id")
      .filter($"doc_id" === 1L)
      .select("dup_fraction").as[Double].head()
    assert(got == 1.0)
  }

  test("incrementalDedup keeps exactly the batch rows new vs history (X1 incremental)") {
    val history = (1L to 100L).map(i => (i, s"doc$i")).toDF("id", "text")
    val batch = (90L to 110L).map(i => (i + 1000L, s"doc$i")).toDF("id", "text")
    // key = text: 90..100 duplicate history, 101..110 are new — exact
    // result regardless of the filter's fpp (positives are join-confirmed)
    val out = Dedup.incrementalDedup(history, batch, Seq("text"),
      expectedItems = 100)
    assert(out.columns.toSeq == Seq("id", "text"))
    assert(out.select("text").as[String].collect().sorted.toSeq ==
      (101L to 110L).map(i => s"doc$i").sorted)

    // null keys behave like groupBy equality: null duplicates null
    val h2 = Seq((1L, Some("a")), (2L, None: Option[String])).toDF("id", "text")
    val b2 = Seq((10L, Some("a")), (11L, None: Option[String]), (12L, Some("b")))
      .toDF("id", "text")
    val out2 = Dedup.incrementalDedup(h2, b2, Seq("text"), expectedItems = 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out2 == Seq(12L))
  }

  test("bloomKeyState persists across batches and merges batch-sized refreshes (X10 lifecycle)") {
    val history = (1L to 50L).map(i => (i, s"doc$i")).toDF("id", "text")
    val state0 = Dedup.bloomKeyState(history, Seq("text"), expectedItems = 1000)

    // batch 1: 40..60 → survivors are 51..60
    val b1 = (40L to 60L).map(i => (i + 100L, s"doc$i")).toDF("id", "text")
    val surv1 = Dedup.incrementalDedupWithState(history, b1, Seq("text"), state0)
    assert(surv1.select("text").as[String].collect().sorted.toSeq ==
      (51L to 60L).map(i => s"doc$i").sorted)

    // refresh = OR with a sketch of ONLY the survivors (same geometry)
    val state1 = Dedup.bloomKeyStateMerge(state0,
      Dedup.bloomKeyState(surv1, Seq("text"), expectedItems = 1000))

    // batch 2: 55..65 → 55..60 now duplicate batch-1 survivors (only
    // detectable if the state actually grew), 61..65 are new
    val b2 = (55L to 65L).map(i => (i + 200L, s"doc$i")).toDF("id", "text")
    val surv2 = Dedup.incrementalDedupWithState(
      history.unionByName(surv1), b2, Seq("text"), state1)
    assert(surv2.select("text").as[String].collect().sorted.toSeq ==
      (61L to 65L).map(i => s"doc$i").sorted)

    // mismatched geometry must be refused, not silently mis-merged
    val other = Dedup.bloomKeyState(history, Seq("text"), expectedItems = 50)
    intercept[Exception](Dedup.bloomKeyStateMerge(state0, other))
  }

  test("removeDuplicateSpans cuts later occurrences, keeps the first, preserves bytes (X36)") {
    // doc 1 holds the canonical span; doc 2 repeats it mid-text; doc 3
    // repeats it at the END (the right-anchored cut path); doc 4 repeats
    // ITSELF (self-repetition is cut after its own first occurrence)
    val span = "one two three four five"
    val docs = Seq(
      (1L, s"alpha $span beta"),
      (2L, s"gamma\t$span  delta"),
      (3L, s"epsilon zeta $span"),
      (4L, s"$span eta $span"),
      (5L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .select("text_clean", "n_removed").as[(String, Long)].collect()

    assert(out(0) == (s"alpha $span beta", 0L)) // first occurrence untouched
    // interior cut: the span and its whole TRAILING separator run go (both
    // spaces); the tab BEFORE the span survives byte-for-byte
    assert(out(1) == ("gamma\tdelta", 5L))
    // suffix cut: the separator BEFORE the span is consumed instead
    assert(out(2) == ("epsilon zeta", 5L))
    // doc 1 holds the corpus-wide first occurrence, so BOTH of doc 4's
    // copies are cut — one interior run, one suffix run
    assert(out(3) == ("eta", 10L))
    assert(out(4) == ("unrelated words only here", 0L))

    // self-repetition in isolation: the doc's own first copy is canonical,
    // only the second goes
    val solo = Seq((7L, s"$span eta $span")).toDF("doc_id", "text")
    val soloOut = Dedup.removeDuplicateSpans(solo, "doc_id", "text", k = 5)
      .select("text_clean", "n_removed").as[(String, Long)].head()
    assert(soloOut == (s"$span eta", 5L))

    // overlapping grams coalesce into ONE cut: a 7-token repeated span is
    // removed whole (3 overlapping 5-grams, 7 covered positions)
    val long = "a b c d e f g"
    val docs2 = Seq((1L, long), (2L, s"x $long y")).toDF("doc_id", "text")
    val out2 = Dedup.removeDuplicateSpans(docs2, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .select("text_clean", "n_removed").as[(String, Long)].collect()
    assert(out2(0) == (long, 0L))
    assert(out2(1) == ("x y", 7L))

    // docs shorter than k never generate grams and pass through unchanged
    val docs3 = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out3 = Dedup.removeDuplicateSpans(docs3, "doc_id", "text", k = 5)
      .select("text_clean").as[String].collect().toSeq
    assert(out3.sorted == Seq("tiny doc", "tiny doc"))
  }
}
