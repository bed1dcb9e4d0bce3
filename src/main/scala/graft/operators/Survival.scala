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
}
