package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of shared pipeline artifacts — the Spark-native form
  * of the reference's task→table→task boundary (every Airflow task exchanges
  * data through a materialized table; README.md:6-17). Several registered
  * queries consume the SAME intermediate (the documents shingle-set frame,
  * the near-dup pair list, the duplicate-cluster map); recomputing it per
  * query is honest as independent benchmarks but is not how a real pipeline
  * runs. Here the first consumer builds and persists the artifact; later
  * consumers reuse it. Keyed by (session, dir, artifact-name) so different
  * sessions/scale-factors never cross-contaminate.
  *
  * Scale note: at 100 TB the same boundary is a parquet materialization
  * (`Pipeline.run(materialize = ...)` or `Table.overwrite`), not an
  * in-memory persist — the `...OnSets` operator entry points accept either.
  */
object Artifacts {

  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** The artifact for `key` under (session, dir): built and persisted on
    * first request, reused afterwards. `build` must be deterministic for
    * the key. The build is serialized under a lock — TrieMap's
    * getOrElseUpdate may otherwise run racing thunks and the loser's
    * persisted frame would pin executor storage with no handle left to
    * unpersist it. Entries live until [[clear]] (Bench calls it between
    * runs); a long-lived multi-tenant driver should clear() when a
    * (session, dir) scope is retired. */
  def cached(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      cache.getOrElseUpdate((spark, dir, key), build.persist())
    }

  /** Drop every cached artifact (and its storage). Bench calls this between
    * repeated suite runs so run 2 measures the same work as run 1. */
  def clear(): Unit = {
    cache.values.foreach(_.unpersist())
    cache.clear()
  }
}
