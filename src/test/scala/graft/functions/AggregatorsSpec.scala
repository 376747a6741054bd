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
}
