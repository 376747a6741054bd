package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 round-trip error is bounded by scale/2; zero and null vectors safe") {
    val df = Seq(
      (1L, Some(Seq(0.5f, -1.0f, 0.25f, 0.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),          // zero vector
      (3L, None: Option[Seq[Float]])        // null vector
    ).toDF("id", "v")
    val q = Quantize.quantizeInt8(df, "v")
    val rows = q.withColumn("dq", Quantize.dequantizeInt8(col("qvec"), col("scale")))
      .withColumn("max_err",
        aggregate(zip_with(col("v"), col("dq"), (a, b) => abs(a.cast("double") - b)),
          lit(0.0), (acc, e) => greatest(acc, e)))
      .orderBy("id").collect()

    val r1 = rows(0)
    assert(r1.getDouble(r1.fieldIndex("scale")) == 1.0 / 127.0)
    assert(r1.getDouble(r1.fieldIndex("max_err")) <= 1.0 / 127.0 / 2 + 1e-12)
    // the extreme component is exactly representable: q = ±127
    assert(r1.getSeq[Byte](r1.fieldIndex("qvec"))(1) == -127)

    val r2 = rows(1)
    assert(r2.getDouble(r2.fieldIndex("scale")) == 0.0)
    assert(r2.getSeq[Byte](r2.fieldIndex("qvec")).forall(_ == 0))
    assert(r2.getDouble(r2.fieldIndex("max_err")) == 0.0)

    val r3 = rows(2)
    assert(r3.isNullAt(r3.fieldIndex("scale")) && r3.isNullAt(r3.fieldIndex("qvec")))
  }

  test("NaN and Inf elements yield null qvec instead of a task kill or zeros") {
    val df = Seq(
      (1L, Seq(Float.NaN, 1.0f)),
      (2L, Seq(Float.PositiveInfinity, 1.0f)),
      (3L, Seq(0.5f, -0.5f))
    ).toDF("id", "v")
    val rows = Quantize.quantizeInt8(df, "v").orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("qvec")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("qvec")))
    assert(!rows(2).isNullAt(rows(2).fieldIndex("qvec")))
  }

  test("quantization is map-only and reserved-name safe") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val plan = Quantize.quantizeInt8(df, "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantize shuffled:\n$plan")
    intercept[IllegalArgumentException](
      Quantize.quantizeInt8(df.withColumn("qvec", lit(1)), "v"))
  }

  test("ANN over dequantized vectors matches exact top-1 on separated data") {
    def unit(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val emb = Seq((1L, unit(0)), (2L, unit(10)), (3L, unit(90)), (4L, unit(95)))
      .toDF("vec_id", "embedding")
    val dq = Quantize.quantizeInt8(emb, "embedding")
      .select(col("vec_id"),
        Quantize.dequantizeInt8(col("qvec"), col("scale")).as("embedding"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid", "qv", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val approx = Similarity.bruteForceTopK(dq, "vec_id", "embedding",
      dq.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid", "qv", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(approx == exact) // int8 noise ≪ the 10° angular separation
  }
}
