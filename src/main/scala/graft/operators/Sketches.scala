package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SketchExprs.{bloomMightContain, cmsEstimate}
import graft.functions.TextFunctions.tokens

/** Sketch-prefiltered exact operators: a mergeable sketch (built in one
  * distributed pass) conservatively prunes the BIG side of a join or
  * aggregation, and a cheap exact pass over the survivors confirms —
  * the output is exact (both sketches only ever over-admit), but the
  * shuffle that dominates at 100 TB moves only the pruned fraction.
  *
  * This is the engine's own version of the runtime-filter idea Spark
  * applies to joins ("InjectRuntimeFilter" bloom pushdown) — expressed
  * as first-class operators so pipelines can prune *before* expensive
  * tokenize/explode stages too, not just at join boundaries.
  */
object Sketches {

  /** Exact semi-join `big ⋉ keys`, bloom-pruned.
    *
    * Plan shape: one aggregate pass over `keys` builds a bloom filter
    * (`df.stat.bloomFilter`, map-side mergeable; driver holds ~1.2 bytes
    * per key at fpp=1%); the probe runs inside whole-stage codegen over
    * `big`'s scan, so only the ~(match + fpp) fraction reaches the exact
    * left-semi confirm join. At 100 TB with a selective key set that
    * turns a full-corpus shuffle into a shuffle of the matching sliver;
    * the confirm join stays (bloom false positives must not leak) and
    * AQE broadcasts it whenever `keys` fits.
    *
    * `expectedKeys <= 0` (default) sizes the bloom with a `count()` over
    * `keys` — a one-Long action; pass an estimate to skip it. */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keyCol: String, fpp: Double = 0.01, expectedKeys: Long = 0L)
      : DataFrame = {
    // the keys plan executes up to three times (count, bloom build,
    // confirm join) — cache it once; left_semi already ignores build-side
    // duplicates, so no distinct() is needed
    val k = TrackedCaches.persist(keys.select(col(keyCol).as(bigKey)))
    val n = if (expectedKeys > 0) expectedKeys
      else math.max(k.count(), 1L)
    val bloom = k.stat.bloomFilter(bigKey, n, fpp)
    big.filter(bloomMightContain(bloom, col(bigKey)))
      .join(k, Seq(bigKey), "left_semi")
  }

  /** Exact heavy hitters: whitespace tokens of `textCol` whose corpus
    * frequency is >= `minCount`, with their exact counts.
    *
    * Two passes over the token stream (tokenized once behind a
    * [[TrackedCaches]] boundary): (1) `df.stat.countMinSketch` — a
    * mergeable fixed-size sketch, driver gets eps-bounded estimates;
    * (2) a codegen'd `cmsEstimate(tok) >= minCount` filter prunes the
    * exploded stream BEFORE the exact groupBy, so the hash-aggregate
    * shuffles only candidate tokens (CMS never underestimates → no true
    * heavy hitter is pruned; over-admitted light tokens fall to the
    * exact HAVING). At 100 TB the long-tail vocabulary — billions of
    * near-unique tokens that dominate a naive groupBy's shuffle — never
    * leaves the map side. */
  def heavyHitters(df: DataFrame, textCol: String, minCount: Long,
      eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42)
      : DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val par = df.sparkSession.sparkContext.defaultParallelism
    val toks = TrackedCaches.persist(
      df.select(explode(tokens(col(textCol))).as("tok"))
        .repartition(par))
    val cms = toks.stat.countMinSketch("tok", eps, confidence, seed)
    toks.filter(cmsEstimate(cms, col("tok")) >= minCount)
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Per-group approximate distinct-token counts via Spark's HLL++
    * aggregate (`approx_count_distinct`) — the third mergeable sketch in
    * the family (bloom = membership, CMS = frequency, HLL =
    * cardinality). Fixed-size registers merge map-side, so the shuffle
    * carries K sketches, never the token stream — the only way a
    * 100 TB distinct count fits one pass. The estimate is a
    * DETERMINISTIC function of the token set (xxhash-based registers,
    * no seed drift), but engine-specific — no cross-engine oracle;
    * SketchesSpec pins the relative-error envelope against the exact
    * count and run-to-run determinism. `rsd` is the target relative
    * standard deviation (Spark default 0.05). */
  def approxDistinctTokens(docs: DataFrame, groupCol: String,
      textCol: String, rsd: Double = 0.05): DataFrame = {
    val toks = docs.select(col(groupCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("tok"))
      .where(length(col("tok")) > 0)
    toks.groupBy(groupCol)
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_distinct"))
  }

  /** KMV (k-minimum-values) distinct sketch per group — the
    * approximate-distinct whose result is a PURE FUNCTION of the data:
    * hash every key to a uniform fraction via md5 (the engine's
    * seeded-randomness convention), keep the k smallest, estimate
    * `D ≈ (k-1) / kth_min`. Unlike HLL (register layout is
    * engine-internal — the one sketch that stayed rows-only), every
    * intermediate here is SQL-replayable, so the ESTIMATE itself is
    * oracle-exact. Mergeable: union two groups' keep-lists, re-take
    * the k smallest. Groups with < k distinct keys report their exact
    * count (the estimate arm needs a full sketch).
    *
    * One distinct-key aggregate + a WindowGroupLimit rank trim —
    * everything after the distinct is k-bounded per group. */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 16, s"bad k: $k (estimate variance ~ 1/sqrt(k))")
    // 60 bits of md5 as a fraction in [0,1) — exactly representable
    // products, same convention as the sampling thresholds
    val frac = conv(substring(md5(col(keyCol).cast("string")), 1, 15),
      16, 10).cast("double") / lit(1152921504606846976.0) // 2^60
    val hashed = df.select(col(groupCol), col(keyCol))
      .distinct()
      .select(col(groupCol), frac.as("__f"))
    val w = Window.partitionBy(groupCol).orderBy(col("__f"))
    hashed
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max(col("__f")).as("__kth"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round((lit(k) - 1) / col("__kth"), 2)))
      .select(col(groupCol), col("n_kept"), col("est_distinct"))
  }
}
