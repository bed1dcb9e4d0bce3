package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * clustering keys so range predicates on EITHER key touch a bounded
  * band of the curve — the standard multi-dimensional file-clustering
  * trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) re-expressed as plain
  * DataFrame ops. Writing a 100 TB corpus range-partitioned by z means
  * a later scan filtered on either dimension prunes most files via
  * min/max statistics, where single-key sorting only prunes its own
  * key's predicates.
  */
object Layout {

  /** 16x16-bit Morton interleave of two long columns (caller quantizes
    * into [0, 65536) — e.g. `x % 65536` for already-integer features,
    * or a scaled min-max for continuous ones). A static 32-term
    * shift/mask sum: pure codegen'd arithmetic, no shuffle, no UDF. */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Deterministic bucket assignment along the curve: (id, z, bucket)
    * with `ntile(nBuckets)` over (z, id). The ntile flavor is the
    * VERIFICATION surface (exactly replayable in ANSI SQL); it funnels
    * the corpus through one ordered reducer, so the production write
    * path is [[zorderRepartition]] — sampled range partitioning, no
    * global sort. */
  def zorderBuckets(df: DataFrame, idCol: String, xCol: String,
      yCol: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    df.select(col(idCol),
        zorder16(pmod(col(xCol).cast("long"), lit(65536L)),
          pmod(col(yCol).cast("long"), lit(65536L))).as("z"))
      .withColumn("bucket",
        ntile(nBuckets).over(Window.orderBy(col("z"), col(idCol))))
  }

  /** The scale path: cluster rows along the z-curve with
    * `repartitionByRange` (reservoir-sampled range bounds — no global
    * sort, no single reducer) and sort within each partition, so a
    * parquet write out of this frame gets tight per-file min/max on
    * BOTH clustering keys. Same curve as [[zorderBuckets]]; only the
    * bucket-boundary mechanism differs (sampled vs exact), which is
    * why the exact flavor is the one under the oracle. */
  def zorderRepartition(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int): DataFrame = {
    require(nPartitions >= 1, s"nPartitions must be >= 1: $nPartitions")
    val z = zorder16(pmod(col(xCol).cast("long"), lit(65536L)),
      pmod(col(yCol).cast("long"), lit(65536L)))
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
