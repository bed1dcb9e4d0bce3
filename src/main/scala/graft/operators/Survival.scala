package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over unit lifetimes — the churn/retention readout
  * behind cohort health dashboards. Input is one row per unit with an
  * integer duration and an observed/censored flag; output is the
  * classic product-limit table: for every duration with at least one
  * observed event, the at-risk count, event and same-time censor
  * counts, the Kaplan-Meier survival estimate and the Nelson-Aalen
  * cumulative hazard.
  *
  * Exactness: deaths/at-risk counts are integral (any accumulation
  * order agrees bit-exactly); the survival product is evaluated as
  * `exp(Σ ln((n-d)/n))` and the hazard as `Σ d/n`, both over the SAME
  * ordered prefix in each engine, then rounded to 6dp — the standard
  * ln/exp-ulp absorption used across the stats family.
  *
  * Scale shape: one hash aggregate corpus → duration-cardinality
  * frame, then windows over that tiny frame. The no-partition windows
  * are safe ONLY because the distinct-duration count is calendar-
  * bounded; [[Survival.MaxDistinctDurations]] enforces that bound
  * loudly rather than letting a corrupt duration column (epoch-micros
  * where days were expected) turn the window into a corpus-sized
  * single-partition sort. */
object Survival {

  /** Hard cap on distinct durations — beyond this the "tiny ordered
    * table" premise of the product-limit windows is broken and the
    * right fix is bucketing durations upstream, not a bigger window. */
  val MaxDistinctDurations = 10000

  /** Product-limit (Kaplan-Meier) estimator.
    *
    * @param units one row per unit
    * @param durationCol integral duration (e.g. days observed)
    * @param observedCol boolean: true = the terminal event happened,
    *   false = right-censored at the duration
    * @return rows at observed-event durations only (the standard KM
    *   table): `t, n_risk, n_event, n_censored, survival, cum_hazard`
    */
  def kaplanMeier(units: DataFrame, durationCol: String,
      observedCol: String): DataFrame = {
    val byT = units
      .select(col(durationCol).cast("long").as("t"),
        col(observedCol).cast("boolean").as("obs"))
      .filter(col("t").isNotNull && col("obs").isNotNull)
      .groupBy("t")
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("n_event"),
        sum(when(col("obs"), 0L).otherwise(1L)).as("n_censored"))
    val grouped = TrackedCaches.persist(byT)
    val k = grouped.count()
    require(k <= MaxDistinctDurations,
      s"kaplanMeier: $k distinct durations exceeds " +
        s"MaxDistinctDurations=$MaxDistinctDurations — the product-" +
        "limit table must stay calendar-sized; bucket durations " +
        "upstream (days, not micros) before calling")
    // exclusive removal prefix -> at-risk; the window frame is the
    // duration-cardinality frame, never the corpus
    val ord = Window.orderBy("t")
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val risked = grouped
      .withColumn("__n", sum(col("n_event") + col("n_censored"))
        .over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("n_risk",
        max("__n").over(Window.partitionBy()) -
          coalesce(sum(col("n_event") + col("n_censored")).over(prior),
            lit(0L)))
    // product over DEATH rows only (censor-only durations contribute
    // ln(1)=0 but would still inject float noise; drop them first)
    val deaths = risked.filter(col("n_event") > 0)
    val cum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a row with n_event == n_risk zeroes the product — and can only
    // be the LAST death row (nobody remains at risk after it). Pin it
    // to exactly 0.0 rather than relying on ln(0): Spark's log(0) is
    // NULL where DuckDB's is -inf, so the naive form diverges.
    deaths
      .withColumn("survival",
        when(col("n_event") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(sum(
            when(col("n_event") < col("n_risk"),
              log((col("n_risk") - col("n_event")) /
                col("n_risk").cast("double"))).otherwise(lit(0.0)))
            .over(cum)), 6)))
      .withColumn("cum_hazard", round(sum(
        col("n_event") / col("n_risk").cast("double")).over(cum), 6))
      .select("t", "n_risk", "n_event", "n_censored", "survival",
        "cum_hazard")
      .orderBy("t")
  }

  /** Two-group log-rank test — "is arm A's survival curve different
    * from arm B's", the significance readout on top of
    * [[kaplanMeier]] for churn/retention A/Bs. Requires EXACTLY two
    * distinct groups (refuses otherwise, naming what it saw).
    *
    * At each duration with at least one event: `E_a += d·n_a/n`,
    * `V += d·(n_a/n)·(n_b/n)·(n−d)/(n−1)`, `O_a += d_a`;
    * `z = (O_a−E_a)/√V`, `chi2 = z²` (1 df). Exactness: the at-risk
    * and death counts are integral prefix sums over the
    * duration-cardinality frame ([[MaxDistinctDurations]] enforced
    * like KM); the E and V accumulations are sorted folds over the
    * per-time terms, never shuffle-order float sums. Output one row:
    * `(group_a, group_b, n_a, n_b, o_a, e_a, chi2, z)` with groups in
    * lexicographic order. */
  def logRank(units: DataFrame, durationCol: String,
      observedCol: String, groupCol: String): DataFrame = {
    val base = units
      .select(col(durationCol).cast("long").as("t"),
        col(observedCol).cast("boolean").as("obs"),
        col(groupCol).cast("string").as("g"))
      .filter(col("t").isNotNull && col("obs").isNotNull &&
        col("g").isNotNull)
    val groups = base.select("g").distinct().limit(3).collect()
      .map(_.getString(0)).sorted
    require(groups.length == 2,
      s"logRank needs exactly 2 groups; saw ${groups.length} " +
        s"(${groups.mkString(", ")}${if (groups.length == 3) ", ..." else ""})")
    val Array(ga, gb) = groups
    val byT = TrackedCaches.persist(base.groupBy("t")
      .agg(sum(when(col("obs") && col("g") === ga, 1L).otherwise(0L))
          .as("ea"),
        sum(when(!col("obs") && col("g") === ga, 1L).otherwise(0L))
          .as("ca"),
        sum(when(col("obs") && col("g") === gb, 1L).otherwise(0L))
          .as("eb"),
        sum(when(!col("obs") && col("g") === gb, 1L).otherwise(0L))
          .as("cb")))
    val k = byT.count()
    require(k <= MaxDistinctDurations,
      s"logRank: $k distinct durations exceeds " +
        s"MaxDistinctDurations=$MaxDistinctDurations — bucket " +
        "durations upstream (days, not micros) before calling")
    val ord = Window.orderBy("t")
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val risked = byT
      .withColumn("__na0", sum(col("ea") + col("ca")).over(all))
      .withColumn("__nb0", sum(col("eb") + col("cb")).over(all))
      .withColumn("na", col("__na0") -
        coalesce(sum(col("ea") + col("ca")).over(prior), lit(0L)))
      .withColumn("nb", col("__nb0") -
        coalesce(sum(col("eb") + col("cb")).over(prior), lit(0L)))
      .withColumn("d", col("ea") + col("eb"))
      .withColumn("n", col("na") + col("nb"))
      .filter(col("d") > 0)
    val terms = risked.select(col("ea"),
      (col("d") * col("na") / col("n").cast("double")).as("__e1"),
      when(col("n") > 1,
        col("d") * (col("na") / col("n").cast("double")) *
          (col("nb") / col("n").cast("double")) *
          ((col("n") - col("d")) / (col("n") - 1).cast("double")))
        .otherwise(lit(0.0)).as("__v"),
      col("__na0"), col("__nb0"))
    val agg = terms.agg(
      max("__na0").as("n_a"), max("__nb0").as("n_b"),
      sum("ea").as("o_a"),
      aggregate(sort_array(collect_list(col("__e1"))), lit(0.0),
        (acc, x) => acc + x).as("__ea"),
      aggregate(sort_array(collect_list(col("__v"))), lit(0.0),
        (acc, x) => acc + x).as("__vv"))
    val z = (col("o_a") - col("__ea")) / sqrt(col("__vv"))
    agg.select(lit(ga).as("group_a"), lit(gb).as("group_b"),
      col("n_a"), col("n_b"), col("o_a"),
      round(col("__ea"), 6).as("e_a"),
      round(when(col("__vv") > 0, z * z), 6).as("chi2"),
      round(when(col("__vv") > 0, z), 6).as("z"))
  }
}
