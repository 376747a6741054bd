package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X90 — grid-bucketed proximity join: all point pairs within a radius,
  * without the cross product. The spatial primitive behind store/POI
  * conflation, sensor-cluster detection, GPS-trace co-location — and the
  * same shape (bucket → neighbor-probe → exact filter) the dedup stack
  * uses in hash space (X2's LSH bands ARE this operator's cells, one
  * abstraction over). The reference ingests shapefiles (S3); this is the
  * join its geometries feed at scale.
  *
  * Mechanics: the plane is tiled into radius-sized cells; a pair within
  * `radius` NECESSARILY lands in the same or an adjacent cell (|Δx| ≤ r
  * ⇒ cell indices differ by ≤ 1), so each left point probes its 3×3 cell
  * neighborhood by EQUI-join against right points' home cells and the
  * exact predicate `dx² + dy² ≤ r²` filters candidates. Each qualifying
  * pair is found exactly once (one probe cell equals the neighbor's one
  * home cell) — no distinct pass. `id_a < id_b` keeps pairs unordered
  * and drops self-pairs.
  *
  * Determinism/exactness: coordinates are NON-NEGATIVE integers in the
  * caller's unit (micro-degrees, millimeters — shift upstream; the
  * non-negativity makes truncating DIV a floor, the same cell on every
  * engine) and the distance test is exact Long arithmetic — no floats,
  * no haversine-library divergence. For geographic micro-degrees the
  * caller applies the cos(lat) longitude scale upstream if metric
  * distance matters; the operator's contract is planar.
  *
  * Scale shape: one map-only cell assignment per side, a 9-way explode
  * on the probe side (map-only fan-out, constant 9), ONE cell-keyed
  * equi-join, a codegen'd exact filter. A cell holding k points emits
  * O(k²) candidates — the standard density caveat: size `radius`'s grid
  * to the data (or pre-aggregate co-located points) exactly as LSH sizes
  * its bands; there is no salting that beats choosing the right cell. */
object Spatial {

  def proximityJoin(points: DataFrame, id: Column, x: Column, y: Column,
      radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be positive, got $radius")
    require(radius <= 1000000000L,
      s"radius $radius exceeds the exact-Long distance budget (1e9)")
    val pts = points.select(id.as("__id"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .filter(col("__id").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    val neg = pts.filter(col("__x") < 0 || col("__y") < 0).limit(1).collect()
    require(neg.isEmpty,
      "proximityJoin: negative coordinate found — shift to non-negative " +
        "units upstream (truncating DIV must be a floor for the cell " +
        "neighborhood argument to hold)")
    val homed = pts
      .withColumn("__cx", expr(s"__x DIV ${radius}L"))
      .withColumn("__cy", expr(s"__y DIV ${radius}L"))
    val probes = homed.select(col("__id"), col("__x"), col("__y"),
      explode(array((for { i <- -1 to 1; j <- -1 to 1 } yield
        struct((col("__cx") + i).as("cx"), (col("__cy") + j).as("cy"))): _*))
        .as("__c"))
      .select(col("__id").as("id_a"), col("__x").as("__xa"),
        col("__y").as("__ya"), col("__c").getField("cx").as("__cx"),
        col("__c").getField("cy").as("__cy"))
    probes.join(
        homed.select(col("__id").as("id_b"), col("__x").as("__xb"),
          col("__y").as("__yb"), col("__cx"), col("__cy")),
        Seq("__cx", "__cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
          (col("__ya") - col("__yb")) * (col("__ya") - col("__yb")))
      .filter(col("d2") <= radius * radius)
      .select(col("id_a"), col("id_b"), col("d2"))
  }
}
