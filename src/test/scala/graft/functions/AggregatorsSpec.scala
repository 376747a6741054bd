package graft.functions

import org.apache.spark.sql.functions.udaf

import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("WeightedMean aggregates partial+final like a built-in (§2.8)") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("x", "w").repartition(2)
    val wm = udaf(Aggregators.WeightedMean)
    val got = df.agg(wm($"x", $"w").as("m")).as[Double].head()
    assert(got == (10.0 * 1 + 20.0 * 3) / 4)
  }

  test("GraftExtensions injects cosine_sim via SparkSessionExtensions") {
    val ext = new GraftExtensions
    val se = new org.apache.spark.sql.SparkSessionExtensions
    ext(se) // must not throw; builders must construct the expression
    val e = GraftFunctions.fns.head._3(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    assert(e.isInstanceOf[CosineSimilarity])
  }

  test("WeightedMean registered for SQL use") {
    spark.udf.register("wmean", udaf(Aggregators.WeightedMean))
    val r = spark.sql("SELECT wmean(x, w) FROM VALUES (1.0, 1.0), (3.0, 1.0) AS t(x, w)")
      .as[Double].head()
    assert(r == 2.0)
  }

  test("nfc_normalize composes decomposed text; identity on NFC; null-safe (§2.8)") {
    GraftFunctions.register(spark)
    // "cafe" + combining acute (2 codepoints for the é) composes to 1
    val decomposed = "cafe\u0301 A\u030A"
    val composed = "caf\u00e9 \u00c5"
    val out = Seq(Some(decomposed), Some(composed), Some("plain ascii"), None)
      .toDF("t")
      .select(GraftFunctions.nfcNormalize($"t").as("n"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some(composed), Some(composed), Some("plain ascii"), None))
    // SQL surface, and the codegen path agrees with eval. NOTE: Spark's
    // chr() is ASCII-mod-256 (chr(769) = chr(1)!), unlike DuckDB's
    // codepoint chr — use a unicode escape literal instead.
    val viaSql = spark.sql("SELECT nfc_normalize('cafe\\u0301')")
      .as[String].head()
    assert(viaSql == "caf\u00e9")
    // a NULL literal (NullType child) must analyze and return null, like
    // every built-in string function
    assert(spark.sql("SELECT nfc_normalize(NULL)").head().isNullAt(0))
  }

  test("VectorSumLong sums elementwise across partitions; ignores nulls (§2.8)") {
    val vs = udaf(new Aggregators.VectorSumLong(3))
    val df = Seq(
      (0, Some(Seq(1L, 2L, 3L))),
      (0, Some(Seq(10L, 20L, 30L))),
      (0, None), // null vector contributes nothing, like built-in aggregates
      (1, Some(Seq(5L, 5L, 5L)))
    ).toDF("g", "v").repartition(3) // force partial buffers + a merge
    val got = df.groupBy($"g").agg(vs($"v").as("s"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(0) == Seq(11L, 22L, 33L))
    assert(got(1) == Seq(5L, 5L, 5L))
    // wrong-length input fails fast instead of silently mis-summing
    val bad = Seq((0, Seq(1L, 2L))).toDF("g", "v")
    intercept[Exception](bad.groupBy($"g").agg(vs($"v")).collect())
  }

  test("VectorSumLong quantized mean matches an exact per-component average") {
    // the q65 shape: floor(x·10⁶) quantization makes the aggregation exact
    // long arithmetic — same result at any partitioning
    val vecs = Seq(Seq(0.5f, -0.25f), Seq(0.25f, 0.75f), Seq(1.0f, 0.5f))
    val df = vecs.map(v => Tuple1(v)).toDF("emb").repartition(3)
    val vs = udaf(new Aggregators.VectorSumLong(2))
    val q = df.select(org.apache.spark.sql.functions.transform(
      $"emb", e => org.apache.spark.sql.functions.floor(
        e.cast("double") * 1000000.0)).as("qv"))
    val sums = q.agg(vs($"qv")).as[Seq[Long]].head()
    assert(sums == Seq(1750000L, 1000000L))
  }

  test("bloom_might_contain probes a serialized filter in-plan; null-safe (§2.8)") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    GraftFunctions.register(spark)
    val filter = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(filter.putLong)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); filter.writeTo(bos); bos.toByteArray }
    val df = Seq(Some(1L), Some(50L), Some(999L), None).toDF("k")
    val got = df.select(GraftFunctions.bloomMightContain(col("k"), bytes).as("m"))
      .as[Option[Boolean]].collect().toSeq
    // inserted keys MUST hit; nulls stay null; 999 may only fp at 1%
    assert(got(0).contains(true) && got(1).contains(true) && got(3).isEmpty)

    // hashed-key form (the incrementalDedup shape) + SQL registration
    val hashed = df.filter(col("k").isNotNull)
      .select(GraftFunctions.bloomMightContain(xxhash64(col("k")), bytes).as("m"))
    assert(hashed.count() == 3) // runs through codegen without error

    // key-type contract enforced at analysis
    val e = intercept[org.apache.spark.sql.AnalysisException](
      df.select(GraftFunctions.bloomMightContain(col("k").cast("string"), bytes)).collect())
    assert(e.getMessage.contains("BIGINT"))
  }
}
