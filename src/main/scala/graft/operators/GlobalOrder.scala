package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training order: every row gets a stable
  * `global_pos` (1-based) under the total order `(md5(id # salt), id)` —
  * the standard "shuffle the corpus once, reproducibly" step before
  * sequence packing / shard writing in a pre-training pipeline
  * (cf. the data-order sections of the GPT-3 / Gopher data cards; the
  * reference engine has no ordering op at all, its pandas frames are
  * driver-local).
  *
  * Why not `orderBy(key)` + `row_number` over an empty window: a global
  * window funnels the whole corpus through ONE reducer. And why not
  * `zipWithIndex` over a range-partitioned sort: Spark's range
  * partitioner SAMPLES boundaries, so shard membership — and with it
  * any per-shard artifact — would change run to run.
  *
  * Shape here, deterministic at any parallelism:
  *   1. shard = the first `hexPrefixLen` hex chars of the md5 key, so
  *      shard order is a PREFIX of the total order (sorting by
  *      (shard, key) == sorting by key);
  *   2. one map-side-combined count pass at the finest granularity
  *      (4 hex chars = 65,536 shards, a bounded driver collect) gives
  *      exact per-shard offsets — and, when `hexPrefixLen = 0` (auto),
  *      picks the smallest prefix whose largest shard fits
  *      `maxRowsPerShard` (same auto-sizing contract as
  *      `Chunking.packSequences` / the cosine block guard);
  *   3. `row_number` over a window PARTITIONED by shard (corpus/16^P
  *      rows per reducer, not corpus) plus the broadcast offset join
  *      yields the global position.
  * Two shuffles total: the tiny count agg and the window exchange.
  * 100 TB at ~5 KB/doc is ~2e10 rows; auto lands on P=4 (≈300 k rows
  * per reducer) without tuning.
  *
  * Null ids are excluded (a null key has no deterministic place in the
  * order); callers wanting them must key-fill first.
  */
object GlobalOrder {

  private val FinestPrefix = 4

  /** Smallest prefix length in 1..4 whose max per-shard row count fits
    * the budget; 4 if none does (finest granularity available).
    * `p4Counts` maps the finest (4-hex-char) shard to its row count. */
  private[operators] def choosePrefix(p4Counts: Map[String, Long],
      maxRowsPerShard: Long): Int =
    (1 until FinestPrefix).find { p =>
      p4Counts.groupMapReduce { case (k, _) => k.take(p) }(_._2)(_ + _)
        .valuesIterator.maxOption.getOrElse(0L) <= maxRowsPerShard
    }.getOrElse(FinestPrefix)

  /** (idCol, global_pos): 1-based position of every non-null-id row
    * under the total order (md5(id + "#" + salt), id). */
  def globalRowNumber(df: DataFrame, idCol: String, salt: String = "order",
      hexPrefixLen: Int = 0, maxRowsPerShard: Long = 1L << 22): DataFrame = {
    require(hexPrefixLen >= 0 && hexPrefixLen <= FinestPrefix,
      s"hexPrefixLen must be in 0..$FinestPrefix (0 = auto): $hexPrefixLen")
    require(maxRowsPerShard >= 1,
      s"maxRowsPerShard must be >= 1: $maxRowsPerShard")
    val spark = df.sparkSession

    val keyed = df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit("#" + salt))).as("__key"))

    // one count pass at the finest granularity; coarser prefixes fold
    // driver-side (16^4 rows bounds the collect at ANY corpus size)
    val p4Counts = keyed
      .groupBy(substring(col("__key"), 1, FinestPrefix).as("__s4"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val p = if (hexPrefixLen > 0) hexPrefixLen
            else choosePrefix(p4Counts, maxRowsPerShard)

    // exclusive cumulative offsets in shard (= key-prefix) order
    val offsets = p4Counts.toSeq
      .groupMapReduce { case (k, _) => k.take(p) }(_._2)(_ + _)
      .toSeq.sortBy(_._1)
      .scanLeft(("", 0L)) { case ((_, acc), (s, c)) => (s, acc + c) }
      .sliding(2).collect { case Seq((_, acc), (s, _)) => (s, acc) }
      .toSeq
    // LocalRelation (no job, single-probe broadcast join) — NOT a
    // typedlit map: CollapseProject inlines those per reference site
    import scala.jdk.CollectionConverters._
    val offsetDf = spark.createDataFrame(
      offsets.map { case (s, o) => Row(s, o) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__shard",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__offset",
          org.apache.spark.sql.types.LongType, nullable = false))))

    val w = Window.partitionBy("__shard").orderBy(col("__key"), col(idCol))
    keyed
      .withColumn("__shard", substring(col("__key"), 1, p))
      .join(broadcast(offsetDf), "__shard")
      .withColumn("global_pos", col("__offset") + row_number().over(w))
      .select(col(idCol), col("global_pos"))
  }
}
