package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X103 — golden-record survivorship: the step AFTER entity resolution.
  * X2/X40 discover that rows describe one entity (duplicate clusters),
  * but a pipeline must then pick WHICH row — or which field values — to
  * keep. That election is "survivorship" in the MDM literature, and
  * leaving it implicit (keep-first) is how silent data loss ships:
  * keep-first keeps whatever the partitioning happened to order first.
  *
  * Two explicit faces:
  *  - [[electCanonical]]: one whole ROW per cluster, chosen by an
  *    ordered rule list (most complete, most recent, highest score —
  *    any Column expressions) with a REQUIRED deterministic tie-break —
  *    a surviving record every engine and every run agrees on.
  *  - [[surviveFields]]: the merged record — per FIELD, the latest
  *    non-NULL value in the cluster by (ts, tieBreak) — the
  *    "best-of-breed" merge that outperforms any single row when
  *    different sources fill different fields.
  *
  * Scale shape: each face is ONE cluster-keyed window (election: a
  * row_number over the rule sort; merge: per-field last-non-NULL frames
  * sharing the single sort/shuffle) — no self-joins, no driver state;
  * a cluster's rows must fit a partition's sort budget, the X51 bound
  * (clusters are small by construction — a mega-cluster is an upstream
  * threshold problem, not a survivorship one). */
object Survivorship {

  /** The canonical row of each cluster: all of `df`'s columns, one row
    * per cluster, chosen by `rules` evaluated best-FIRST (descending —
    * higher completeness/recency/score wins) with `tieBreak` ascending
    * as the final total order. NULL rule values sort LAST (a missing
    * credential never beats a present one). NULL clusters drop (no
    * membership, no election). */
  def electCanonical(df: DataFrame, cluster: Column, rules: Seq[Column],
      tieBreak: Column): DataFrame = {
    require(rules.nonEmpty, "electCanonical needs at least one rule")
    require(!df.columns.contains("__rn"),
      "column name __rn is reserved by electCanonical")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cluster)
      .orderBy(rules.map(_.desc_nulls_last) :+ tieBreak.asc: _*)
    df.filter(cluster.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The merged golden record: one row per cluster with, for every field
    * in `fields`, the LAST non-NULL value by (ts asc, tieBreak asc) —
    * "latest wins, but never un-fills a field". Output:
    * `(cluster_id, n_members, fields…)`. NULL clusters drop; a field
    * all-NULL across the cluster stays NULL. */
  def surviveFields(df: DataFrame, cluster: Column, ts: Column,
      tieBreak: Column, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "surviveFields needs at least one field")
    val missing = fields.filterNot(df.columns.contains)
    require(missing.isEmpty, s"field(s) not in frame: ${missing.mkString(",")}")
    require(!df.columns.contains("__rn") && !df.columns.contains("cluster_id"),
      "column names __rn/cluster_id are reserved by surviveFields")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cluster).orderBy(ts.asc, tieBreak.asc)
    val whole = w.rowsBetween(Long.MinValue, Long.MaxValue)
    val decorated = df.filter(cluster.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .select(Seq(cluster.as("cluster_id"), col("__rn"),
        count(lit(1)).over(whole).as("n_members")) ++
        fields.map(f =>
          last(col(f), ignoreNulls = true).over(whole).as(f)): _*)
    decorated.filter(col("__rn") === 1)
      .drop("__rn")
      .select(("cluster_id" +: "n_members" +: fields).map(col): _*)
  }
}
