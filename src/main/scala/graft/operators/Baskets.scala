package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the co-purchase lift table
  * behind "users who bought X also bought Y" and, in curation
  * pipelines, the tag/feature co-occurrence audit. One row per
  * unordered item pair with support, both conditional confidences,
  * and lift; every statistic is a ratio of integral counts, so the
  * whole table is oracle-exact.
  *
  * Scale shape: baskets reduce to DISTINCT (basket, item) pairs, the
  * pair join is an equi-join ON THE BASKET KEY (never a corpus cross
  * join), and its fan-out is quadratic in single-basket size — so
  * [[Baskets.MaxBasketSize]] is enforced loudly up front (the
  * wedge-cap / MaxUserEvents precedent): a degenerate "basket" (one
  * warehouse account holding 10^5 items) must be split or dropped
  * upstream, not ground through at d². Item-pair counts are
  * map-side-combinable hash aggregates throughout. */
object Baskets {

  /** Hard cap on items per basket — the pair join's d² bound. */
  val MaxBasketSize = 10000L

  /** @param minPairCount emit only pairs co-occurring in at least
    *   this many baskets (support pruning; 2 kills the random-pair
    *   noise floor) */
  def associationRules(df: DataFrame, basketCol: String,
      itemCol: String, minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"bad minPairCount: $minPairCount")
    // cached: three actions read this frame (the cap probe, the
    // basket count, the pair join) — uncached each would re-shuffle
    // the corpus distinct
    val items = TrackedCaches.persist(df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct())
    val sizes = items.groupBy("__b").agg(count(lit(1)).as("n"))
    // ONE job answers both guards (r15): the basket count and the
    // max-size overflow flag ride the same aggregate — the detailed
    // top-3 offender probe (a second pass) only runs on the failure
    // path, where cost no longer matters
    val probe = sizes.agg(count(lit(1)).as("nb"), max("n").as("mx"))
      .first()
    val nBaskets = probe.getLong(0)
    if (nBaskets > 0 && probe.getLong(1) > MaxBasketSize) {
      val hot = sizes.filter(col("n") > MaxBasketSize)
        .orderBy(col("n").desc).limit(3).collect()
      require(hot.isEmpty,
        s"associationRules: basket(s) over MaxBasketSize=$MaxBasketSize " +
          hot.map(r => s"${r.get(0)} (${r.getLong(1)})").mkString(", ") +
          " — the per-basket pair join is quadratic in basket size; " +
          "split or drop degenerate baskets upstream")
    }
    val itemN = items.groupBy("__i").agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    // lift = P(ab)/(P(a)P(b)) = n_ab*nB / (n_a*n_b): counts to double
    // BEFORE the products (the chi-square marginal overflow lesson)
    pairs
      .join(broadcast(itemN.select(col("__i").as("item_a"),
        col("cnt").as("n_a"))), "item_a")
      .join(broadcast(itemN.select(col("__i").as("item_b"),
        col("cnt").as("n_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round(col("n_ab") / lit(nBaskets.toDouble), 6).as("support"),
        round(col("n_ab") / col("n_a").cast("double"), 6)
          .as("conf_a_to_b"),
        round(col("n_ab") / col("n_b").cast("double"), 6)
          .as("conf_b_to_a"),
        round(col("n_ab").cast("double") * nBaskets /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy("item_a", "item_b")
  }
}
