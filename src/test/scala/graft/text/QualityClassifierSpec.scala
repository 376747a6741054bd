package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the rug"),
    (3L, "de", "der hund sitzt auf dem teppich"),
    (4L, "de", "die katze sitzt auf der matte"),
    (5L, "en", "")
  ).toDF("doc_id", "lang", "text")
  private val isEn = col("lang") === "en"

  // independent replica of the md5 bucket hash (java MessageDigest, not the
  // Spark expression under test) — the round-1 pin must not be circular
  private def bucketOf(gram: String, buckets: Int, seed: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$gram".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }
  private def gramsOf(text: String): Seq[String] = {
    val tk = text.split("\\s+").filter(_.nonEmpty).toSeq
    tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
  }
  // hand features: doc -> (bucket -> x_micro), x = (1e6*cnt) DIV n
  private def handFeatures(buckets: Int): Map[Long, Map[Long, Long]] =
    docs.select("doc_id", "text").as[(Long, String)].collect().toSeq.map {
      case (id, text) =>
        val bs = gramsOf(text).map(bucketOf(_, buckets, "qc"))
        val n = bs.size
        id -> bs.groupBy(identity).map { case (b, g) =>
          b -> (1000000L * g.size) / n }
    }.toMap

  test("features: md5 buckets, floor-div fractions, empty doc emits none (X66)") {
    val got = QualityClassifier.features(docs, "doc_id", "text", 32)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => r._2 -> r._3).toMap }
    val expected = handFeatures(32).filter(_._2.nonEmpty)
    assert(got == expected)
    assert(!got.contains(5L)) // token-less doc: no feature rows
    intercept[IllegalArgumentException](
      QualityClassifier.features(docs, "doc_id", "text", 0))
  }

  test("train round 1 matches hand gradient arithmetic exactly (X66)") {
    val buckets = 32
    val lr = 2000000L
    val n = 5L
    val feats = handFeatures(buckets)
    val y = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 0L, 4L -> 0L, 5L -> 1000000L)
    // round 1: every p is exactly 500000
    val grads = feats.toSeq.flatMap { case (d, xs) =>
      xs.toSeq.map { case (b, x) => b -> (y(d) - 500000L) * x }
    }.groupBy(_._1).map { case (b, ts) => b -> ts.map(_._2).sum }
    val expected = grads.map { case (b, g) =>
      b -> Math.floorDiv(lr * Math.floorDiv(g, n), 1000000000000L) }
    val w = QualityClassifier.train(docs, "doc_id", "text", isEn,
      buckets, iterations = 1, lrMicro = lr)
    assert(w == expected)
  }

  test("score matches hand margins under a hand-built model; empty doc is neutral (X66)") {
    val buckets = 32
    val w = QualityClassifier.train(docs, "doc_id", "text", isEn, buckets, 1)
    val got = QualityClassifier.score(docs, "doc_id", "text", w, buckets)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val feats = handFeatures(buckets)
    for (d <- Seq(1L, 2L, 3L, 4L)) {
      val s = feats(d).map { case (b, x) => w.getOrElse(b, 0L) * x }.sum
      val m = Math.floorDiv(s, 1000000L)
      val p = math.round(1e6 / (1.0 + math.exp(-m / 1e6)))
      assert(got(d) == ((m, p)), s"doc $d")
    }
    assert(got(5L) == ((0L, 500000L))) // no tokens -> margin 0, p exactly 0.5
  }

  test("3 iterations separate the classes; training is repartition-stable (X66)") {
    val w = QualityClassifier.train(docs, "doc_id", "text", isEn, 256, 3)
    val again = QualityClassifier.train(docs.repartition(7), "doc_id", "text",
      isEn, 256, 3)
    assert(w == again, "weights changed under repartitioning")
    val m = QualityClassifier.score(docs, "doc_id", "text", w, 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // disjoint vocabularies: every positive doc outranks every negative doc
    assert(Seq(1L, 2L).map(m).min > Seq(3L, 4L).map(m).max)
    // p is a probability in micros
    val ps = QualityClassifier.score(docs, "doc_id", "text", w, 256)
      .select("p_micro").as[Long].collect()
    assert(ps.forall(p => p >= 0L && p <= 1000000L))
  }

  test("bounds: iteration/lr/empty-corpus requires (X66)") {
    intercept[IllegalArgumentException](
      QualityClassifier.train(docs, "doc_id", "text", isEn, 32, 0))
    intercept[IllegalArgumentException](
      QualityClassifier.train(docs, "doc_id", "text", isEn, 32, 51))
    intercept[IllegalArgumentException](
      QualityClassifier.train(docs, "doc_id", "text", isEn, 32, 1, lrMicro = 6000000L))
    intercept[IllegalArgumentException](
      QualityClassifier.train(docs.filter(lit(false)), "doc_id", "text", isEn, 32, 1))
  }
}
