package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial nearest-neighbor via grid-cell bucketing — the "closest
  * depot to every store within r" join that a naive formulation writes
  * as a cross join with a distance filter. Points are hashed to
  * radius-sized grid cells; a left point only meets the right points
  * of its 3×3 cell neighborhood, which by construction contains every
  * candidate within `radius` — so the join is a pure EQUI-join on the
  * cell key and the quadratic never materializes.
  *
  * Distance is squared Euclidean in coordinate units (exact IEEE
  * arithmetic on both engines — no trig, whose libm rounding differs
  * across engines; for true geodesics swap the final filter for
  * haversine and keep the plumbing). Nearest pick is the composite
  * `(dist2, right id)` argmin, so equidistant candidates resolve
  * deterministically. Left points with no right point inside the
  * radius are absent from the output.
  *
  * Scale: candidates per left point are bounded by 9× the densest
  * right-side cell; [[Geo.MaxCellOccupancy]] enforces that bound
  * loudly (the Linkage maxBlock contract) — a degenerate cell (all
  * depots at one mall) must be deduplicated or the radius shrunk
  * upstream, not silently ground through. */
object Geo {

  /** Hard cap on right-side points sharing one grid cell. */
  val MaxCellOccupancy = 10000L

  def gridNearest(left: DataFrame, leftId: String, right: DataFrame,
      rightId: String, latCol: String, lonCol: String,
      radius: Double): DataFrame = {
    require(radius > 0, s"bad radius: $radius")
    def cellOf(c: Column): Column = floor(c / lit(radius)).cast("long")
    val r = right
      .filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .select(col(rightId).as("__rid"), col(latCol).as("__rlat"),
        col(lonCol).as("__rlon"))
      .withColumn("__cla", cellOf(col("__rlat")))
      .withColumn("__clo", cellOf(col("__rlon")))
    val hot = r.groupBy("__cla", "__clo").agg(count(lit(1)).as("n"))
      .filter(col("n") > MaxCellOccupancy)
      .orderBy(col("n").desc).limit(3).collect()
    require(hot.isEmpty,
      s"gridNearest: cell(s) over MaxCellOccupancy=$MaxCellOccupancy " +
        hot.map(x => s"(${x.get(0)},${x.get(1)}): ${x.getLong(2)}")
          .mkString(", ") +
        " — the 3x3 candidate bound is broken; dedup co-located " +
        "points or shrink the radius upstream")
    val l = left
      .filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .select(col(leftId).as("__lid"), col(latCol).as("__llat"),
        col(lonCol).as("__llon"))
      .withColumn("__dla", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dlo", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__cla", cellOf(col("__llat")) + col("__dla"))
      .withColumn("__clo", cellOf(col("__llon")) + col("__dlo"))
    val d2 = (col("__llat") - col("__rlat")) *
      (col("__llat") - col("__rlat")) +
      (col("__llon") - col("__rlon")) * (col("__llon") - col("__rlon"))
    val byL = Window.partitionBy("__lid")
      .orderBy(col("__d2").asc, col("__rid").asc)
    l.join(r, Seq("__cla", "__clo"))
      .withColumn("__d2", d2)
      .filter(col("__d2") <= lit(radius * radius))
      .withColumn("__rk", row_number().over(byL))
      .filter(col("__rk") === 1)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        round(col("__d2"), 6).as("dist2"))
  }
}
