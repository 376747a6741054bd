package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain: english-ish; raw corpus: a mix
  private val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the rug"),
    (3L, "de", "der hund sitzt auf dem teppich"),
    (4L, "de", "die katze sitzt auf der matte"),
    (5L, "en", "")
  ).toDF("doc_id", "lang", "text")

  private def dists(buckets: Int) = (
    Dsir.bucketDistribution(docs.filter(col("lang") === "en"), "doc_id", "text", buckets),
    Dsir.bucketDistribution(docs, "doc_id", "text", buckets))

  test("bucketHits: unigrams + bigrams, bounded bucket ids, empty doc emits none (X41)") {
    val hits = Dsir.bucketHits(docs, "doc_id", "text", buckets = 64)
    val byDoc = hits.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // 6 tokens → 6 unigrams + 5 bigrams = 11
    assert(byDoc(1L) == 11L && byDoc(3L) == 11L)
    assert(!byDoc.contains(5L))
    val range = hits.agg(min(col("bucket")), max(col("bucket"))).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 64L)
  }

  test("logRatioTable matches hand arithmetic on a 1-bucket degenerate case (X41)") {
    // buckets = 1: every gram lands in bucket 0; ct = target hits,
    // cr = raw hits → lr = 1e6·ln((ct+1)(R+1)/((cr+1)(T+1)))
    val (tgt, raw) = dists(1)
    val ct = tgt.agg(sum("cnt")).head().getLong(0)
    val cr = raw.agg(sum("cnt")).head().getLong(0)
    val lr = Dsir.logRatioTable(tgt, raw, 1).as[(Long, Long)].collect()
    val expected = math.round(1e6 * math.log(
      ((ct + 1.0) * (cr + 1.0)) / ((cr + 1.0) * (ct + 1.0))))
    assert(lr.toSeq == Seq((0L, expected))) // = 0: ratio is exactly 1
  }

  test("importanceScores favor target-domain docs; empty doc scores 0 (X41)") {
    val (tgt, raw) = dists(256)
    val scores = Dsir.importanceScores(docs, "doc_id", "text", tgt, raw, 256)
      .as[(Long, Long)].collect().toMap
    assert(scores.size == 5)
    assert(scores(5L) == 0L)
    // every english doc outranks every german doc
    assert(Seq(1L, 2L).map(scores).min > Seq(3L, 4L).map(scores).max)
  }

  test("importanceScoresSelfRaw == the general form, off ONE hits pass (X41)") {
    val (tgt, raw) = dists(256)
    val general = Dsir.importanceScores(docs, "doc_id", "text", tgt, raw, 256)
      .as[(Long, Long)].collect().toSeq.sorted
    val fast = Dsir.importanceScoresSelfRaw(docs, "doc_id", "text",
        col("lang") === "en", 256)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(fast == general,
      "self-raw fast path diverged from the two-corpora composition")
    intercept[IllegalArgumentException](Dsir.importanceScoresSelfRaw(
      docs, "doc_id", "text", col("lang") === "en", 0))
  }

  test("gumbelResampleK is deterministic, k-bounded, and biased by score (X41)") {
    val (tgt, raw) = dists(256)
    val scored = Dsir.importanceScores(docs, "doc_id", "text", tgt, raw, 256)
    val pick = Dsir.gumbelResampleK(scored, col("doc_id"), col("score_micro"), k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(pick.size == 2)
    val again = Dsir.gumbelResampleK(
        scored.repartition(7), col("doc_id"), col("score_micro"), k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(pick == again)
    // with scores scaled up to dominate the Gumbel noise, the top-score
    // docs are chosen with certainty — the softmax concentration property
    val hot = scored.select(col("doc_id"), (col("score_micro") * 1000L).as("score_micro"))
    val sure = Dsir.gumbelResampleK(hot, col("doc_id"), col("score_micro"), k = 2)
      .select("doc_id").as[Long].collect().toSet
    val top2 = scored.orderBy(col("score_micro").desc, col("doc_id"))
      .select("doc_id").as[Long].take(2).toSet
    assert(sure == top2)
  }
}
