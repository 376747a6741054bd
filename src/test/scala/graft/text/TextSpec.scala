package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect()(0).getAs[T]("v")

  private def oneSeq[T](c: org.apache.spark.sql.Column, text: String): Seq[T] =
    one[scala.collection.Seq[T]](c, text).toSeq

  test("tokens splits on whitespace, dropping empties") {
    assert(oneSeq[String](TextStats.tokens(col("t")), "  a  b c ") == Seq("a", "b", "c"))
    // non-space whitespace at the edges must not produce empty tokens
    assert(oneSeq[String](TextStats.tokens(col("t")), "\thello world\n") == Seq("hello", "world"))
    assert(oneSeq[String](TextStats.tokens(col("t")), "\t \n") == Seq())
  }

  test("tokenCount / distinctTokenCount") {
    assert(one[Int](TextStats.tokenCount(col("t")), "a b a") == 3)
    assert(one[Int](TextStats.distinctTokenCount(col("t")), "a b a") == 2)
  }

  test("subwordCount splits on case/digit/punct boundaries (BPE proxy)") {
    assert(one[Int](TextStats.subwordCount(col("t")), "hello world") == 2)
    assert(one[Int](TextStats.subwordCount(col("t")), "spark3 re-run") == 5)
  }

  test("shingles builds word n-grams; short docs give empty array") {
    assert(oneSeq[String](TextStats.shingles(col("t"), 3), "a b c d") == Seq("a b c", "b c d"))
    assert(oneSeq[String](TextStats.shingles(col("t"), 3), "a b") == Seq())
  }

  test("fingerprints are distinct per distinct shingle") {
    assert(oneSeq[Long](TextStats.fingerprints(col("t"), 2), "a b a b").size == 2)
  }

  test("punctRatio and stopwordRatio") {
    assert(one[Double](TextStats.punctRatio(col("t")), "ab,.") == 0.5)
    assert(one[Double](TextStats.stopwordRatio(col("t"), Seq("the")), "the cat the") == 2.0 / 3)
  }

  test("charEntropySumMicro: hand arithmetic, uniform max, runs score low (X43)") {
    // "aab": n=3; a:2 → 2·round(1e6·ln(3/2)); b:1 → round(1e6·ln 3)
    val expected = 2 * math.round(1e6 * math.log(3.0 / 2)) +
      math.round(1e6 * math.log(3.0))
    assert(one[Long](TextStats.charEntropySumMicro(col("t")), "aab") == expected)
    // degenerate single-char run: ln(n/n) = 0 everywhere
    assert(one[Long](TextStats.charEntropySumMicro(col("t")), "aaaaaa") == 0L)
    assert(one[Long](TextStats.charEntropySumMicro(col("t")), "") == 0L)
    // all-distinct maximizes the per-char entropy: n·ln(n)
    assert(one[Long](TextStats.charEntropySumMicro(col("t")), "abcd") ==
      4 * math.round(1e6 * math.log(4.0)))
  }

  test("qualityScore is in [0,1] and favors diverse long text") {
    val lo = one[Double](TextStats.qualityScore(col("t")), "a a a a")
    val hi = one[Double](TextStats.qualityScore(col("t")),
      (1 to 70).map(i => s"w$i").mkString(" "))
    assert(lo >= 0.0 && hi <= 1.0 && hi > lo)
  }

  test("chunk produces overlapping windows; short docs one chunk; empty none") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 tokens, chunk 10/stride 7 -> 4 chunks
      (2L, "a b c"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextStats.chunk(docs, "doc_id", "text", chunkTokens = 10, overlap = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_tokens").as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq((1L, 0, 10), (1L, 1, 10), (1L, 2, 10), (1L, 3, 4), (2L, 0, 3)))
    val firstTwo = TextStats.chunk(docs.filter(col("doc_id") === 1), "doc_id", "text", 10, 3)
      .orderBy("chunk_idx").select("chunk_text").as[String].take(2)
    assert(firstTwo(0).endsWith("w10") && firstTwo(1).startsWith("w8 w9 w10 w11"))
  }

  test("packSequences fills bins by running token total in id order") {
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j")
    ).toDF("doc_id", "text") // token counts 3,2,4,1; maxTokens=5 -> cum 3,5,9,10 -> bins 0,0,1,1
    val out = TextStats.packSequences(docs, "doc_id", "text", maxTokens = 5L)
      .orderBy("doc_id").select("doc_id", "bin").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("packSequences plan has no single-task global window") {
    // the two-phase prefix sum must never funnel the corpus through one
    // task: no Exchange SinglePartition anywhere in the physical plan
    val docs = Seq.tabulate(100)(i => (i.toLong, s"tok$i " * (i % 7 + 1))).toDF("doc_id", "text")
    val packed = TextStats.packSequences(docs, "doc_id", "text", maxTokens = 10L)
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window in plan:\n$plan")
    // and the partitioned form still equals the sequential prefix sum
    val seqBins = {
      val counts = (0 until 100).map(i => i % 7 + 1)
      counts.scanLeft(0L)(_ + _).drop(1).map(c => math.ceil(c / 10.0).toLong - 1)
    }
    val got = packed.orderBy("doc_id").select("bin").as[Long].collect().toSeq
    assert(got == seqBins)
  }

  test("selectUnderTokenBudget keeps the maximal best-score prefix under budget") {
    val docs = Seq(
      (1L, "a b c", 0.9),    // 3 tokens, rank 1 -> cum 3
      (2L, "d e", 0.5),      // 2 tokens, rank 3 -> cum 9
      (3L, "f g h i", 0.7),  // 4 tokens, rank 2 -> cum 7
      (4L, "j k l", 0.5)     // 3 tokens, rank 4 (score tie -> id) -> cum 12
    ).toDF("doc_id", "text", "q")
    val out = TextStats.selectUnderTokenBudget(docs, "doc_id", col("text"),
        col("q"), budget = 9L)
      .orderBy("doc_id").select("doc_id", "cum_tokens")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 9L), (3L, 7L)))
    // prefix rule: doc 4 overflows (12 > 9) and is cut even though no later
    // doc could fill the gap; a budget below the best doc selects nothing
    assert(TextStats.selectUnderTokenBudget(docs, "doc_id", col("text"),
      col("q"), budget = 2L).count() == 0)
    intercept[IllegalArgumentException](
      TextStats.selectUnderTokenBudget(docs, "doc_id", col("text"), col("q"), 0L))
  }

  test("selectUnderTokenBudget treats null text as zero tokens, never crashes") {
    val docs = Seq((1L, "a b c", 0.9), (2L, null: String, 0.8), (3L, "d e", 0.7))
      .toDF("doc_id", "text", "q")
    val out = TextStats.selectUnderTokenBudget(docs, "doc_id", col("text"),
        col("q"), budget = 5L)
      .orderBy("doc_id").select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L), (2L, 0L, 3L), (3L, 2L, 5L)))
    // an all-null-text corpus exercises the all-null partition-total path
    val nulls = Seq((1L, null: String, 0.5), (2L, null: String, 0.4))
      .toDF("doc_id", "text", "q")
    assert(TextStats.selectUnderTokenBudget(nulls, "doc_id", col("text"),
      col("q"), 10L).count() == 2)
  }

  test("selectUnderTokenBudget is partitioning-independent and single-task-free") {
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, s"tok$i " * (i % 7 + 1), (i % 13).toDouble)).toDF("doc_id", "text", "q")
    val a = TextStats.selectUnderTokenBudget(docs.repartition(1), "doc_id",
      col("text"), col("q"), 150L)
    val b = TextStats.selectUnderTokenBudget(docs.repartition(17), "doc_id",
      col("text"), col("q"), 150L)
    assert(a.except(b).isEmpty && b.except(a).isEmpty && a.count() > 0)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window in plan:\n$plan")
  }

  test("langId picks the profile with most marker hits, ties to first code") {
    assert(one[String](TextStats.langId(col("t")), "the cat and the dog") == "en")
    assert(one[String](TextStats.langId(col("t")), "el la de que y en un") == "es")
    // no markers at all -> first language code alphabetically
    assert(one[String](TextStats.langId(col("t")), "zzz qqq") == "de")
  }

  test("scrubPii redacts URLs, emails and IPv4; URL consumes embedded address") {
    assert(one[String](TextStats.scrubPii(col("t")),
      "mail a.b+c@x-corp.co.uk now") == "mail <EMAIL> now")
    assert(one[String](TextStats.scrubPii(col("t")),
      "see https://x.io/a?user=bob@x.io ok") == "see <URL> ok")
    assert(one[String](TextStats.scrubPii(col("t")),
      "from 192.168.0.17 port 80") == "from <IP> port 80")
    // version strings with only three octets are NOT IPs
    assert(one[String](TextStats.scrubPii(col("t")),
      "release 1.2.3 is out") == "release 1.2.3 is out")
  }

  test("pseudonymizePii: stable tags, referential integrity, ordering (X93)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def tag(kind: String, v: String, seed: String = "p93") =
      s"<$kind:" + md.digest(s"$seed:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8) + ">"
    val p = TextStats.pseudonymizePii(col("t"), "p93")
    // the SAME address gets the SAME tag — joins survive the scrub
    val e = tag("EMAIL", "bob@x.io")
    assert(one[String](p, "bob@x.io wrote to bob@x.io") == s"$e wrote to $e")
    // distinct addresses get distinct tags
    val got = one[String](p, "bob@x.io cc alice@y.org")
    assert(got == s"$e cc ${tag("EMAIL", "alice@y.org")}")
    // substring hazard: a@b.co is a proper substring of xa@b.com —
    // longest-first folding must keep both intact
    val long = tag("EMAIL", "xa@b.com")
    val short = tag("EMAIL", "a@b.co")
    assert(one[String](p, "xa@b.com vs a@b.co") == s"$long vs $short")
    // IPs tag independently; an IP inside an email is consumed by it
    assert(one[String](p, "host 10.0.0.7 up") ==
      s"host ${tag("IP", "10.0.0.7")} up")
    // a different seed is unlinkable
    assert(one[String](TextStats.pseudonymizePii(col("t"), "other"),
      "bob@x.io") == tag("EMAIL", "bob@x.io", "other"))
    // NULL stays NULL; no matches passes through untouched
    assert(Seq(Option.empty[String]).toDF("t")
      .select(p.as("v")).collect()(0).isNullAt(0))
    assert(one[String](p, "no pii here 1.2.3") == "no pii here 1.2.3")
    intercept[IllegalArgumentException](
      TextStats.pseudonymizePii(col("t"), ""))
  }

  test("selectUnderTokenBudgetPerGroup applies an independent budget per group") {
    val docs = Seq(
      // group g1: quality order 3 > 2 > 1; budgets cut inside the group
      (1L, "g1", "w w w w", 0.1),   // 4 tokens, worst
      (2L, "g1", "w w w", 0.5),     // 3 tokens
      (3L, "g1", "w w", 0.9),       // 2 tokens, best
      // group g2: a single huge doc over budget
      (4L, "g2", "w w w w w w w w", 0.9),
      // group g3: everything fits
      (5L, "g3", "w", 0.2)
    ).toDF("doc_id", "src", "text", "q")
    val out = TextStats.selectUnderTokenBudgetPerGroup(
        docs, "doc_id", "src", col("text"), col("q"), budget = 5L)
      .select("src", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    // g1: doc3 (cum 2) + doc2 (cum 5) fit; doc1 (cum 9) cut.
    // g2: doc4 alone overflows (cum 8 > 5) -> nothing. g3: doc5 (cum 1).
    assert(out == Set(("g1", 3L, 2L), ("g1", 2L, 5L), ("g3", 5L, 1L)))
    intercept[IllegalArgumentException](TextStats.selectUnderTokenBudgetPerGroup(
      docs, "doc_id", "src", col("text"), col("q"), 0L))
  }

  test("normalizeForDedup canonicalizes case, punctuation and whitespace") {
    def one(in: String): String =
      Seq(Tuple1(in)).toDF("t")
        .select(TextStats.normalizeForDedup(col("t"))).as[String].head()
    assert(one("Hello,  World!") == "hello world")
    assert(one("  a\t b\nc ") == "a b c")
    assert(one("a-b_c.d") == "a b c d")
    assert(one(null) == "")
    // already-canonical text is untouched
    assert(one("plain lower text") == "plain lower text")
    // the canonical forms of formatting variants collide (the dedup key)
    assert(one("The QUICK fox.") == one("the quick   fox"))
  }

  test("repetitionStats computes top-bigram fraction per doc") {
    val docs = Seq(
      (1L, "buy now buy now buy now"),       // "buy now" 3 of 5 bigrams
      (2L, "all words are fully distinct"),  // top bigram count 1
      (3L, "a")                              // < 2 tokens: no bigrams, absent
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 5L, 3L, 0.6), (2L, 4L, 1L, 0.25)))
  }

  test("gopherFlags: each rule trips on its own failure mode") {
    // 24 words, mean len in [3,10], has 2+ stopwords, all alphabetic
    val good = ("the quick brown fox jumps over that lazy dog and runs with " +
      "great speed through green fields where tall trees grow very high today")
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n") // 10/10 bullet lines
    val ells = "the first line trails off...\nthe second one also does…\n" +
      "a third line ends normally\nand that makes ratio one half..." // 3/4 > 0.3
    val symbols = "the " + Seq.fill(22)("#tag").mkString(" ") + " and with that" // 22/26 > 0.1
    val numeric = Seq.fill(25)("12345").mkString(" ") // 0% alphabetic words
    val docs = Seq(
      (1L, good), (2L, bullets), (3L, ells), (4L, symbols), (5L, numeric),
      (6L, "")).toDF("id", "text")
    val out = docs
      .select(col("id"), TextStats.gopherFlags(col("text"), minWords = 20).as("g"))
      .select(col("id"), col("g.ok_word_count"), col("g.ok_bullet_lines"),
        col("g.ok_ellipsis_lines"), col("g.ok_symbol_ratio"),
        col("g.ok_alpha_words"), col("g.ok_stopwords"), col("g.keep"))
      .orderBy("id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(out(0) == ((1L, true, true, true, true, true, true, true)))
    assert(out(1)._3 == false && out(1)._8 == false)       // bullets trip
    assert(out(2)._4 == false && out(2)._2 == true)        // ellipsis lines trip
    assert(out(3)._5 == false)                             // symbol ratio trips
    assert(out(4)._6 == false && out(4)._7 == false)       // alpha + stopwords trip
    assert(out(5) == ((6L, false, true, true, true, false, false, false))) // empty doc
  }

  test("gopherFlags: Table A1 repetition screens, both outcomes + tie-break") {
    // 1: a repeated line among 3 -> dup fraction 1/3 > 0.3 AND its chars
    //    dominate; 2: distinct lines pass both; 3: one 2-gram covers most
    //    of the text -> top-ngram trips; 4: two grams TIE at count 2 — the
    //    lexicographically smaller ("aa bb", 10 chars of 69) must win over
    //    the longer ("cc ddd…", 56 chars) or ok_top_ngram flips
    val big = "d" * 25
    val docs = Seq(
      (1L, "the cat sat on a mat\nsome other words here\nthe cat sat on a mat"),
      (2L, "the cat sat on a mat\nsome other words here\nthe dog ran off far"),
      (3L, "spam ham spam ham spam ham"),
      (4L, s"aa bb aa bb cc $big cc $big")
    ).toDF("id", "text")
    val out = docs
      .select(col("id"), TextStats.gopherFlags(col("text")).as("g"))
      .select(col("id"), col("g.ok_dup_lines"), col("g.ok_dup_line_chars"),
        col("g.ok_top_ngram"))
      .orderBy("id")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out(0) == ((1L, false, false, true)))
    assert(out(1) == ((2L, true, true, true)))
    assert(out(2)._4 == false)                       // "spam ham" covers 24/26
    assert(out(3)._4 == true)                        // tie broke to "aa bb"
    // single-line and empty docs pass the line screens vacuously
    val edge = Seq((1L, "just one line"), (2L, "")).toDF("id", "text")
      .select(TextStats.gopherFlags(col("text")).as("g"))
      .select(col("g.ok_dup_lines"), col("g.ok_dup_line_chars"),
        col("g.ok_top_ngram"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(edge.forall(_ == ((true, true, true))))
  }

  test("gopherFlagsBound == gopherFlags, bit-identical (the hot-path pin)") {
    // every rule family exercised: good doc, bullets, symbols, repeated
    // lines, dominant 2-gram, empty, null
    val big = "d" * 25
    val docs = Seq(
      Some("the quick brown fox jumps over that lazy dog and runs with " +
        "great speed through green fields where tall trees grow very high"),
      Some((1 to 10).map(i => s"- item $i").mkString("\n")),
      Some("the " + Seq.fill(22)("#tag").mkString(" ") + " and with that"),
      Some("the cat sat on a mat\nsome other words here\nthe cat sat on a mat"),
      Some("spam ham spam ham spam ham"),
      Some(s"aa bb aa bb cc $big cc $big"),
      Some(""), None
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val viaColumn = docs.select(col("id"),
        TextStats.gopherFlags(col("text"), minWords = 20,
          stopwords = Seq("a", "the")).as("g"))
      .orderBy("id").collect().toSeq
    val viaBound = TextStats.gopherFlagsBound(docs, col("text"), "g",
        minWords = 20, stopwords = Seq("a", "the"))
      .select(col("id"), col("g"))
      .orderBy("id").collect().toSeq
    assert(viaBound == viaColumn)
    // temps must not leak into the output schema
    assert(!TextStats.gopherFlagsBound(docs, col("text"), "g")
      .columns.exists(_.startsWith("__gopher")))
    // reserved temp collision refused
    intercept[IllegalArgumentException](TextStats.gopherFlagsBound(
      docs.withColumn("__gopher_t", lit(1)), col("text"), "g"))
  }

  test("langIdByLine: per-line majority, duplicate multiplicity, blank lines dropped") {
    val docs = Seq(
      (1L, "the cat and the dog\nle chat est la\nthe end of it"), // en,fr,en
      (2L, "le chat est la\nle chat est la"),   // duplicate lines both count
      (3L, "  \n\t\nthe cat and the dog"),      // blanks dropped, 1 en line
      (4L, " \n\t")                             // nothing left -> no row
    ).toDF("id", "text")
    val out = TextStats.langIdByLine(docs, "id", "text")
      .orderBy("id")
      .as[(Long, Long, String, Double, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, "en", 0.666667, 2),
      (2L, 2L, "fr", 1.0, 1),
      (3L, 1L, "en", 1.0, 1)))
  }

  test("templateGrams: per-source df top-k, per-doc distinct, minDf gate (X53)") {
    val docs = Seq(
      // source a: "visit our shop" in 3 of 4 docs — the template; one doc
      // repeats it TWICE (distinct-per-doc must count it once)
      ("a", "alpha beta visit our shop"),
      ("a", "visit our shop visit our shop gamma"),
      ("a", "delta visit our shop"),
      ("a", "epsilon zeta eta"),
      // source b: its own 3-doc footer; a's template appears only twice
      // here — below minDf, must not surface for b
      ("b", "one two contact the admin"),
      ("b", "contact the admin three"),
      ("b", "four contact the admin visit our shop"),
      ("b", "five six visit our shop")
    ).toDF("source", "text")
    val got = TextStats.templateGrams(docs, "source", col("text"),
        n = 3, minDf = 3L, k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    assert(got == Set(
      ("a", "visit our shop", 3L, 1),
      ("b", "contact the admin", 3L, 1)))
    intercept[IllegalArgumentException](
      TextStats.templateGrams(docs, "source", col("text"), minDf = 1L))
  }

  test("readability: hand counts, floored micros, degenerate texts (X134)") {
    def r(text: String) = Seq(Option(text)).toDF("t")
      .select(TextStats.readability(col("t")).as("r"))
      .select("r.words", "r.sentences", "r.syllables", "r.flesch_micro",
        "r.fk_grade_micro")
      .as[(Int, Int, Long, Option[Long], Option[Long])].collect()(0)
    // "Hello world. It works!": W=4 S=2; syllables He-llo 2, world 1,
    // It 1, works 1 → Y=5 under the vowel-group rule
    // flesch = 206835000 − 4·1015000//2 − 5·84600000//4 = 99055000
    // fk = 4·390000//2 + 5·11800000//4 − 15590000 = −60000
    assert(r("Hello world. It works!") ==
      ((4, 2, 5L, Some(99055000L), Some(-60000L))))
    // no terminal punctuation: a fragment is ONE sentence
    assert(r("plain words here")._2 == 1)
    // vowel-less tokens still carry one syllable each
    assert(r("zzz zzz.") == ((2, 1, 2L,
      Some(206835000L - 2030000L - 84600000L),
      Some(780000L + 11800000L - 15590000L))))
    // zero-word texts: zero counts, NULL scores — never "hardest"
    assert(r("") == ((0, 0, 0L, None, None)))
    assert(r("   ") == ((0, 0, 0L, None, None)))
    assert(r(null) == ((0, 0, 0L, None, None)))
  }
}
