package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training order: every row gets a stable
  * `global_pos` (1-based) under the total order `(md5(id # salt), id)` —
  * the standard "shuffle the corpus once, reproducibly" step before
  * sequence packing / shard writing in a pre-training pipeline
  * (cf. the data-order sections of the GPT-3 / Gopher data cards; the
  * reference engine has no ordering op at all, its pandas frames are
  * driver-local). [[globalPrefixSum]] generalizes the same machinery
  * from row numbers to running token totals, which is exactly what
  * token-balanced shard assignment needs.
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
  *   2. one map-side-combined count/sum pass at the finest granularity
  *      (4 hex chars = 65,536 shards, a bounded driver collect) gives
  *      exact per-shard offsets — and, when `hexPrefixLen = 0` (auto),
  *      picks the smallest prefix whose largest shard fits
  *      `maxRowsPerShard` (same auto-sizing contract as
  *      `Chunking.packSequences` / the cosine block guard);
  *   3. a window PARTITIONED by shard (corpus/16^P rows per reducer,
  *      not corpus) plus the broadcast offset join yields the global
  *      running value.
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

  /** Shared core: key + shard the rows, compute exact per-shard
    * EXCLUSIVE offsets of `count(*)` and (optionally) `sum(valueCol)`
    * driver-side, and return the keyed frame joined to its broadcast
    * offsets: columns = input + __key, __shard, __offset
    * (+ __voffset when `valueCol` is set). */
  private def shardedWithOffsets(df: DataFrame, idCol: String,
      salt: String, hexPrefixLen: Int, maxRowsPerShard: Long,
      valueCol: Option[String]): DataFrame = {
    require(hexPrefixLen >= 0 && hexPrefixLen <= FinestPrefix,
      s"hexPrefixLen must be in 0..$FinestPrefix (0 = auto): $hexPrefixLen")
    require(maxRowsPerShard >= 1,
      s"maxRowsPerShard must be >= 1: $maxRowsPerShard")
    val spark = df.sparkSession

    val keyed = df.filter(col(idCol).isNotNull)
      .withColumn("__key",
        md5(concat(col(idCol).cast("string"), lit("#" + salt))))

    // one count/sum pass at the finest granularity; coarser prefixes
    // fold driver-side (16^4 rows bounds the collect at ANY corpus size)
    val valueAgg = valueCol.map(v =>
      sum(coalesce(col(v).cast("long"), lit(0L))).as("__vsum"))
    val p4 = keyed
      .groupBy(substring(col("__key"), 1, FinestPrefix).as("__s4"))
      .agg(count(lit(1)).as("__cnt"), valueAgg.toSeq: _*)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (valueCol.isDefined) r.getLong(2) else 0L))
      .toMap

    val p = if (hexPrefixLen > 0) hexPrefixLen
            else choosePrefix(p4.view.mapValues(_._1).toMap, maxRowsPerShard)

    // exclusive cumulative offsets in shard (= key-prefix) order
    val offsets = p4.toSeq
      .groupMapReduce { case (k, _) => k.take(p) }(_._2) {
        case ((c1, v1), (c2, v2)) => (c1 + c2, v1 + v2)
      }
      .toSeq.sortBy(_._1)
      .scanLeft(("", (0L, 0L))) { case ((_, (ca, va)), (s, (c, v))) =>
        (s, (ca + c, va + v))
      }
      .sliding(2).collect { case Seq((_, acc), (s, _)) => (s, acc) }
      .toSeq
    // LocalRelation (no job, single-probe broadcast join) — NOT a
    // typedlit map: CollapseProject inlines those per reference site
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val offsetDf = spark.createDataFrame(
      offsets.map { case (s, (c, v)) => Row(s, c, v) }.asJava,
      StructType(Seq(
        StructField("__shard", StringType, nullable = false),
        StructField("__offset", LongType, nullable = false),
        StructField("__voffset", LongType, nullable = false))))

    keyed
      .withColumn("__shard", substring(col("__key"), 1, p))
      .join(broadcast(offsetDf), "__shard")
  }

  private def orderWindow(idCol: String) =
    Window.partitionBy("__shard").orderBy(col("__key"), col(idCol))

  /** (idCol, global_pos): 1-based position of every non-null-id row
    * under the total order (md5(id + "#" + salt), id). */
  def globalRowNumber(df: DataFrame, idCol: String, salt: String = "order",
      hexPrefixLen: Int = 0, maxRowsPerShard: Long = 1L << 22): DataFrame =
    shardedWithOffsets(df, idCol, salt, hexPrefixLen, maxRowsPerShard, None)
      .withColumn("global_pos",
        col("__offset") + row_number().over(orderWindow(idCol)))
      .select(col(idCol), col("global_pos"))

  /** (idCol, global_pos, cum_before): [[globalRowNumber]] plus the
    * EXCLUSIVE running sum of `valueCol` (e.g. token counts) in global
    * order — `cum_before` is the total strictly before this row, so
    * `floor(cum_before / binSize)` is this row's token-balanced bin.
    * `valueCol` must be integral (cast to long; nulls count as 0). */
  def globalPrefixSum(df: DataFrame, idCol: String, valueCol: String,
      salt: String = "order", hexPrefixLen: Int = 0,
      maxRowsPerShard: Long = 1L << 22,
      keepValue: Boolean = false): DataFrame = {
    val w = orderWindow(idCol)
    val base = shardedWithOffsets(df, idCol, salt, hexPrefixLen,
        maxRowsPerShard, Some(valueCol))
      .withColumn("global_pos", col("__offset") + row_number().over(w))
      .withColumn("cum_before",
        col("__voffset") +
          coalesce(sum(coalesce(col(valueCol).cast("long"), lit(0L)))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // keepValue rides the value column through (consumers like
    // systematic sampling need cum_before AND the row's own weight
    // without a corpus-sized join back)
    val cols = Seq(col(idCol), col("global_pos"), col("cum_before")) ++
      (if (keepValue) Seq(col(valueCol)) else Nil)
    base.select(cols: _*)
  }

  /** Global 1-based rank under the total order `(valueCol, idCol)` for
    * an INTEGRAL value column, without a single-reducer sort.
    *
    * Same offset machinery as [[globalRowNumber]], but the shard must
    * be a PREFIX of the VALUE order, so instead of md5 prefixes the
    * rows shard by fixed-width value buckets derived from one (min,
    * max) aggregate: `shard = (v - min) / width`, width sized so shard
    * count stays <= `maxShards` (bounded driver collect). Bucket
    * membership is a pure function of the value — deterministic at any
    * parallelism, unlike a sampled range partitioner. Heavy ties (many
    * rows at one value) concentrate in that value's shard — the
    * documented bound, inherent to ranking ties, not to the sharding.
    *
    * Output: input columns + `global_pos`. Null values are excluded
    * (no deterministic place in the order). */
  def valueRank(df: DataFrame, valueCol: String, idCol: String,
      maxShards: Int = 65536): DataFrame = {
    require(maxShards >= 1, s"bad maxShards: $maxShards")
    val rows = df.filter(col(valueCol).isNotNull)
    val stats = rows
      .agg(min(col(valueCol).cast("long")).as("mn"),
        max(col(valueCol).cast("long")).as("mx")).first()
    if (stats.isNullAt(0))
      return rows.withColumn("global_pos", lit(0L)).limit(0)
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    // BigInt ceil-div: a value range spanning more than Long.MaxValue
    // (mx huge positive, mn huge negative) would wrap `mx - mn`
    val width = ((BigInt(mx) - BigInt(mn)) / maxShards + 1)
      .max(1).toLong
    // shard via DOUBLE arithmetic: `value - mn` as longs can overflow
    // the same way; IEEE ops are monotone, so double rounding can only
    // shift a boundary, never reorder shards — shard ranges stay
    // contiguous in the value and equal values always share a shard,
    // which is all the offset machinery needs
    val sharded = rows.withColumn("__vshard",
      floor((col(valueCol).cast("long").cast("double") - lit(mn.toDouble))
        / lit(width.toDouble)).cast("long"))
    val counts = sharded.groupBy("__vshard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__vshard", "__voff"))
    sharded.join(offDf, "__vshard")
      .withColumn("global_pos",
        col("__voff") + row_number().over(
          Window.partitionBy("__vshard")
            .orderBy(col(valueCol), col(idCol))))
      .drop("__vshard", "__voff")
  }
}
