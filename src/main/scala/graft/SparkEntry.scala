package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmOps, Q, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def all: Vector[Q] = {
    val qs = Relational.queries ++ LlmOps.queries
    // a duplicate name would silently shadow one query in the Maps below —
    // the driver would then grade a different plan than the one registered
    val dupes = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The README join pipeline (reference README.md:126-171) re-expressed on
    * the TPC-H-ish fixtures: customer ⋈ nation ⋈ region with broadcast dims. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q05_customer_geo").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
