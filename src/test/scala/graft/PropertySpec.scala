package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.Schemas
import graft.dedup.Dedup

/** Property tests (SURVEY.md §5c): schema-merge algebra and dedup
  * idempotence over generated inputs (plain scalacheck generators driven
  * with explicit seeds — scalatestplus bridge is not on the classpath). */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val fieldGen: Gen[StructField] = for {
    name <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    tpe <- Gen.oneOf[DataType](IntegerType, LongType, StringType, DoubleType)
  } yield StructField(name, tpe)

  private val schemaGen: Gen[StructType] =
    Gen.listOfN(4, fieldGen).map(fs => StructType(fs))

  test("mergeDtype: no duplicate names, keeps first occurrence, covers both inputs") {
    for ((a, b) <- samples(schemaGen, 40).zip(samples(schemaGen, 40).reverse)) {
      val merged = Schemas.mergeDtype(a, b)
      val names = merged.fieldNames.toSeq
      assert(names.distinct == names)
      assert((a.fieldNames ++ b.fieldNames).toSet == names.toSet)
      a.headOption.foreach(f => assert(merged(f.name).dataType == f.dataType))
      assert(Schemas.mergeDtype(a, a).fieldNames.toSeq == a.fieldNames.toSeq.distinct)
    }
  }

  test("exactKeepFirst is idempotent and keeps the minimum key per group") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(30, for {
      id <- Gen.chooseNum(0L, 100L)
      text <- Gen.oneOf("t1", "t2", "t3", "t4")
    } yield (id, text))
    for (rows <- samples(rowsGen, 5) if rows.nonEmpty) {
      val df = rows.toDF("doc_id", "text")
      val once = Dedup.exactKeepFirst(df, Seq("text"), col("doc_id"))
      val twice = Dedup.exactKeepFirst(once, Seq("text"), col("doc_id"))
      val o = once.as[(Long, String)].collect().toSet
      assert(twice.as[(Long, String)].collect().toSet == o)
      val expected = rows.groupBy(_._2).toSeq.map { case (t, rs) => (rs.map(_._1).min, t) }.toSet
      assert(o == expected)
    }
  }
}
