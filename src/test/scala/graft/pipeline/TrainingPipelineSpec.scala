package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextStats

/** End-to-end integration: the complete LLM training-data preparation story
  * — exact dedup → near-dedup (cluster representatives) → quality filter →
  * chunking → sequence packing — composed as one Pipeline DAG over the
  * fixture corpus. Asserts the cross-stage invariants a corpus build relies
  * on; every stage is one of the library's production operators, so this is
  * the "a user could run their whole pipeline on this" proof.
  */
class TrainingPipelineSpec extends SparkSpec {

  test("documents flow dedup → filter → chunk → pack through one DAG") {
    val sf = "/root/testdata/sf0.001"
    val pipeline = new Pipeline(Seq(
      Stage("corpus", Nil,
        _ => spark.read.parquet(s"$sf/documents.parquet")),
      Stage("exact_dedup", Seq("corpus"),
        d => Dedup.exactKeepFirst(d("corpus"), Seq("text"), col("doc_id"))),
      Stage("near_dedup", Seq("exact_dedup"), { d =>
        val docs = d("exact_dedup")
        val pairs = Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.8)
        val reps = Dedup.connectedComponents(pairs, docs, "doc_id")
          .filter(col("doc_id") === col("component")).select("doc_id")
        docs.join(reps, "doc_id")
      }),
      Stage("quality", Seq("near_dedup"),
        d => d("near_dedup").filter(TextStats.qualityScore(col("text")) > 0.3)),
      Stage("chunks", Seq("quality"),
        d => TextStats.chunk(d("quality"), "doc_id", "text", 100, 20)),
      Stage("packed", Seq("quality"),
        d => TextStats.packSequences(d("quality"), "doc_id", "text", 2000L))))

    val out = pipeline.run(spark)
    val nCorpus = out("corpus").count()
    val nExact = out("exact_dedup").count()
    val nNear = out("near_dedup").count()
    val nQuality = out("quality").count()

    // each dedup/filter stage only removes rows, and none empties the corpus
    assert(nCorpus >= nExact && nExact >= nNear && nNear >= nQuality)
    assert(nQuality > 0)
    // near-dedup removed at least the fixture's planted duplicate partners
    assert(nNear < nExact)

    // chunking covers every surviving document and respects the window size
    val chunks = out("chunks")
    assert(chunks.select("doc_id").distinct().count() == nQuality)
    assert(chunks.agg(max(col("n_tokens"))).head().getInt(0) <= 100)

    // packing assigns every surviving document exactly once, and the bin
    // assignment equals the sequential prefix-sum reference exactly — the
    // strongest possible check, with no distribution-dependent heuristics
    val packed = out("packed")
    val rows = packed.orderBy("doc_id")
      .select("doc_id", "n_tokens", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.size == nQuality)
    var cum = 0L
    rows.foreach { case (docId, nTokens, bin) =>
      cum += nTokens
      val expected = math.ceil(cum.toDouble / 2000L).toLong - 1
      assert(bin == expected, s"doc $docId: bin $bin, sequential reference $expected")
    }
  }
}
