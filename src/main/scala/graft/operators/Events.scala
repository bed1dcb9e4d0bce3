package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators (batch event-time analytics on the `events`
  * table: event_id, ts, user_id, event_type, value, props).
  *
  * The same tumbling-window aggregation runs unchanged on a streaming
  * DataFrame — see `graft.streaming.StreamingOps`, which adds the
  * watermark. */
object Events {

  /** Tumbling event-time window aggregation. Window start ==
    * date_trunc(hour) for hour-aligned windows, so the result is
    * oracle-checkable in ANSI SQL. */
  def hourlyByType(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), exactValueSum)

  /** Order-independent money sum: `value` is 2-decimal by construction,
    * so summing as decimal(18,2) is exact regardless of partial-agg
    * order. A plain `round(sum(double), 2)` is nondeterministic at .xx5
    * boundaries — the FP accumulation order varies with partitioning and
    * can flip the last rounded digit between runs/engines. */
  private[graft] def exactValueSum =
    sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")

  /** Trailing event-time window stats per key: for every event, the
    * count and exact money sum over the same user's events in
    * `[ts - windowSeconds, ts]` — a RANGE (value-based) window frame
    * over epoch seconds, not a ROWS frame, so gaps and bursts are
    * handled correctly. One shuffle on the key + an in-partition sort.
    * NOTE Spark's sliding frame has no aggregate retraction: each
    * row's frame is re-accumulated from scratch, so a user with n
    * events inside one window costs O(n) per row — fine for
    * human-scale activity, but for machine-dense keys pre-bucket to
    * coarse intervals (tumbling agg + a short ROWS frame) instead.
    * Epoch-second granularity: events sharing a second are all
    * in-frame together. */
  def rollingWindow(events: DataFrame,
      windowSeconds: Long = 86400L): DataFrame = {
    require(windowSeconds > 0, s"bad windowSeconds: $windowSeconds")
    val w = Window.partitionBy("user_id")
      .orderBy(col("es"))
      .rangeBetween(-windowSeconds, 0)
    events
      .withColumn("es", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"), col("es"),
        count(lit(1)).over(w).as("n_window"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
          .as("sum_window"))
  }

  /** Gap-based sessionization: a new session starts after `gapMinutes`
    * of per-user inactivity. One shuffle (by user), two window passes
    * over user-local data — the classic scalable formulation (running
    * sum over new-session flags). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val flagged = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        // unix_timestamp, NOT cast("long"): the cast is illegal on
        // TIMESTAMP_NTZ (the default pandas/DuckDB parquet flavor) while
        // unix_timestamp floor-seconds both flavors identically under a
        // UTC session zone (the Temporal.bucketize idiom)
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("sess_no", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "sess_no")
      .agg(
        min("ts").as("sess_start"),
        max("ts").as("sess_end"),
        count(lit(1)).as("n_events"),
        exactValueSum)
  }

  /** Ordered conversion funnel: for each user, the earliest time of
    * step 1, the earliest step-2 event STRICTLY after it, the earliest
    * step-3 event strictly after that, and the reached level.
    *
    * Scalable formulation: ONE shuffle on the user key, then one
    * chained running-min window pass per step over user-local data —
    * no self-joins, no per-step scans. Step k's qualifying time at a
    * row is `min(es of step-k events whose frame-local step-(k-1)
    * qualifying time < es)`; a RANGE frame on epoch seconds makes the
    * result independent of tie order among same-second events (the
    * frame always contains ALL rows at <= the current second).
    *
    * Strictly-after uses second granularity (`unix_timestamp`, legal on
    * both TIMESTAMP and TIMESTAMP_NTZ inputs): two steps inside the
    * same second do NOT chain — the conservative reading, and the one
    * the SQL oracle replays exactly. */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size >= 2, s"funnel needs >=2 steps, got $steps")
    val w = Window.partitionBy("user_id").orderBy("es")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("q1",
        min(when(col("event_type") === steps.head, col("es"))).over(w))
    steps.indices.tail.foreach { k =>
      df = df.withColumn(s"q${k + 1}",
        min(when(col("event_type") === steps(k) &&
          col(s"q$k") < col("es"), col("es"))).over(w))
    }
    // fold inner-to-outer so the HIGHEST reached level wins the CASE
    val levels = steps.indices.map { k =>
      (col(s"t${k + 1}").isNotNull, lit(k + 1))
    }
    df.groupBy("user_id")
      .agg(min("q1").as("t1"),
        steps.indices.tail.map(k => min(s"q${k + 1}").as(s"t${k + 1}")): _*)
      .withColumn("level",
        levels.foldLeft(lit(0)) { case (acc, (cond, lvl)) =>
          when(cond, lvl).otherwise(acc)
        }.cast("int"))
  }

  /** Weekly cohort retention: cohort = the user's first active week
    * (weeks since `anchorEpoch`), one output row per (cohort_week,
    * week_offset) with the distinct-user count still active that many
    * weeks after their first.
    *
    * One shuffle on the user key (window min for the cohort week), a
    * user-local distinct, then a tiny (weeks x offsets)-sized final
    * aggregate — the corpus never shuffles twice at full width. */
  def weeklyRetention(events: DataFrame,
      anchorEpoch: Long = 1704067200L /* 2024-01-01 UTC */): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    events
      .withColumn("week",
        floor((unix_timestamp(col("ts")) - lit(anchorEpoch)) / lit(604800.0))
          .cast("long"))
      .withColumn("cohort_week", min("week").over(byUser))
      .select("user_id", "cohort_week", "week").distinct()
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: count and row-normalized probability of each
    * (event_type -> next event_type) step. Deterministic under
    * timestamp ties via the (ts, event_id) sort key.
    *
    * One shuffle on the user key for the lead window; the remaining
    * aggregates are K^2-sized (K = event-type cardinality), so the
    * normalizing window runs on a tiny frame, never the corpus. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val byFrom = Window.partitionBy("event_type")
    counts.withColumn("prob",
      round(col("cnt") / sum("cnt").over(byFrom), 6))
  }

  /** Top event paths: the most frequent length-3 event-type sequences
    * across user journeys (the "what do users actually do" report a
    * funnel's fixed steps can't answer). One user-key shuffle for the
    * two lead windows; the path aggregate is K^3-bounded (K = type
    * cardinality) and the top-k is a TakeOrdered, never a global sort.
    * Deterministic under timestamp ties via the (ts, event_id) key. */
  def topPaths(events: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1, s"bad k: $k")
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("e2", lead("event_type", 1).over(byUser))
      .withColumn("e3", lead("event_type", 2).over(byUser))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** Cohort LTV curves — cumulative revenue per signup-week cohort by
    * week offset, normalized per cohort member (the growth-analytics
    * companion to [[weeklyRetention]]: retention counts who comes back,
    * LTV counts what they spend). Money is decimal-summed (exact,
    * order-independent) INCLUDING the cumulative window, then cast to
    * double at the edge; offsets with zero purchases simply don't
    * appear (the cumulative at later offsets is unaffected).
    *
    * Shape: one user-key window for cohort assignment, a K-row
    * (cohort x offset) aggregate, cohort sizes broadcast back, and the
    * cumulative window runs over that K-row frame — never the corpus. */
  def cohortLtv(events: DataFrame,
      anchorEpoch: Long = 1704067200L /* 2024-01-01 UTC */,
      purchaseType: String = "purchase"): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    // persist: the cohort-size branch and the revenue branch both
    // consume the windowed frame — uncached, the user-key shuffle and
    // scan would run twice (tracked, harness-released)
    val base = graft.operators.TrackedCaches.persist(events
      .withColumn("week",
        floor((unix_timestamp(col("ts")) - lit(anchorEpoch)) / lit(604800.0))
          .cast("long"))
      .withColumn("cohort_week", min("week").over(byUser)))
    val sizes = base.select("user_id", "cohort_week").distinct()
      .groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val rev = base.filter(col("event_type") === purchaseType)
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("__rev"))
    val wc = Window.partitionBy("cohort_week").orderBy("week_offset")
    rev.join(broadcast(sizes), "cohort_week")
      .withColumn("__cum", sum("__rev").over(wc))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("__rev").cast("double").as("rev"),
        col("__cum").cast("double").as("cum_rev"),
        round(col("__cum").cast("double") / col("n_users"), 6).as("ltv"))
  }

  /** RFM (recency / frequency / monetary) user segmentation — the
    * classic behavioral tercile grid: per user, days since last
    * activity (vs the corpus max timestamp, so the result is a pure
    * function of the data), total event count, and the EXACT money sum
    * over `purchaseType` events (decimal-summed, order-independent);
    * each metric tercile-binned against discrete (type-1) quantile
    * thresholds of the per-user distribution — actual data values,
    * cross-engine exact — with the qualityBins tie convention (bin =
    * 1 + thresholds strictly below the value, so ties never split).
    *
    * Scale shape: ONE user-key aggregate builds the metric frame; the
    * two threshold rows ride back as broadcasts; binning is map-only.
    * No window over the corpus, nothing collected. */
  def rfmSegments(events: DataFrame,
      purchaseType: String = "purchase"): DataFrame = {
    val tmax = broadcast(events.agg(
      max(unix_timestamp(col("ts"))).as("__tmax")))
    // persist the K-row metric frame: the three tercile aggregates plus
    // the final binning join would otherwise re-run the corpus-sized
    // user aggregate four times (tracked, so harnesses release it)
    val m = graft.operators.TrackedCaches.persist(events.crossJoin(tmax)
      .groupBy("user_id")
      .agg(
        min(col("__tmax") - unix_timestamp(col("ts"))).as("__rec_s"),
        count(lit(1)).as("frequency"),
        coalesce(sum(when(col("event_type") === purchaseType,
            col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).cast("double").as("monetary"))
      .withColumn("recency_days", floor(col("__rec_s") / 86400.0))
      .drop("__rec_s"))
    // ONE aggregate computes all six thresholds (three separate
    // tercile jobs would re-scan the metric frame and stack three
    // broadcast joins — the operator's own oracle already used the
    // single-agg form; self-review aligned the engine with it)
    def q(c: String, p: String, as: String) =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $c)").as(as)
    val thresholds = broadcast(m.agg(
      q("recency_days", "0.33333333", "__r1"),
      q("recency_days", "0.66666667", "__r2"),
      q("frequency", "0.33333333", "__f1"),
      q("frequency", "0.66666667", "__f2"),
      q("monetary", "0.33333333", "__m1"),
      q("monetary", "0.66666667", "__m2")))
    def bin(c: String, lo: String, hi: String) =
      lit(1) + (col(c) > col(lo)).cast("int") +
        (col(c) > col(hi)).cast("int")
    m.crossJoin(thresholds)
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"),
        bin("recency_days", "__r1", "__r2").as("r_bin"),
        bin("frequency", "__f1", "__f2").as("f_bin"),
        bin("monetary", "__m1", "__m2").as("m_bin"))
      .withColumn("segment",
        concat(lit("R"), col("r_bin"), lit("F"), col("f_bin"),
          lit("M"), col("m_bin")))
  }

  /** DAU / trailing-MAU stickiness per day — the engagement headline
    * (what fraction of the product's monthly actives show up on a
    * given day). `dau(d)` = distinct users on day d; `mau(d)` =
    * distinct users over the trailing `windowDays` ending at d;
    * stickiness = dau/mau (6dp). Days are epoch-day numbers
    * (`floor(epoch/86400)` — the q_cusum_volume convention).
    *
    * Scale shape: the corpus reduces ONCE to distinct (day, user)
    * pairs — the only event-volume shuffle. The trailing-window
    * distinct count cannot be a window function (COUNT(DISTINCT) over
    * a moving frame isn't supported anywhere); instead the day-user
    * frame range-joins the (tiny, distinct) day list — fan-out bounded
    * by `windowDays` per pair, the standard bounded-expansion trade
    * ([[rollingWindow]]'s bucket pattern). Output:
    * `(day, dau, mau, stickiness)`. */
  def stickiness(events: DataFrame, windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1, s"bad windowDays: $windowDays")
    val dayUser = events.select(
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"),
        col("user_id"))
      .distinct()
    val days = dayUser.select("day").distinct()
    val dau = dayUser.groupBy("day")
      .agg(count(lit(1)).as("dau")) // pairs are distinct already
    val mau = dayUser.as("p")
      .join(days.as("d"),
        col("p.day") > col("d.day") - windowDays &&
          col("p.day") <= col("d.day"))
      .groupBy(col("d.day").as("day"))
      .agg(count_distinct(col("p.user_id")).as("mau"))
    dau.join(mau, "day")
      .withColumn("stickiness",
        round(col("dau") / col("mau").cast("double"), 6))
      .select("day", "dau", "mau", "stickiness")
  }

  /** Inter-arrival gap statistics per event type: each event's gap to
    * the SAME user's previous event (any type — "how long since this
    * user last did anything", the engagement-cadence read), attributed
    * to the later event's type. Ordering is `(ts, event_id)` so
    * same-timestamp events have one deterministic predecessor on any
    * engine. Gaps are integral epoch seconds, so the discrete
    * median/p90 stay BIGINT (the q_funnel_ttc type lesson) and the
    * mean is one double rounded 6dp.
    *
    * One user-key shuffle for the lag window, then a type-key
    * aggregate — no joins, state O(1) per row. */
  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type"), col("user_id"), col("event_id"),
        col("ts"), unix_timestamp(col("ts")).as("__s"))
      .withColumn("__gap", col("__s") - lag(col("__s"), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("__gap")), 6).as("mean_gap_s"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __gap)")
          .cast("long").as("median_gap_s"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY __gap)")
          .cast("long").as("p90_gap_s"))
  }

  /** Seasonality-adjusted daily-volume anomalies per event type: each
    * (type, day) volume is z-scored against the SAME DAY-OF-WEEK's
    * distribution for that type across the whole window (a Monday is
    * judged against Mondays — the raw z-score [[graft.operators
    * .Profile.zscoreBy]] would flag every weekend of a weekday-heavy
    * source). Moments come from exact integer sums over the
    * (type, dow) window — no one-pass variance accumulator — so the z
    * is one engine-identical double expression, 6dp. Degenerate
    * baselines (< 2 obs or zero variance) get a null z and no flag.
    * Shapes: one day-level reduction, then (type, dow)-partition
    * windows over the DAYS-sized frame — corpus size appears once. */
  def dowAnomaly(events: DataFrame, zThreshold: Double = 2.0)
      : DataFrame = {
    require(zThreshold > 0, s"bad zThreshold: $zThreshold")
    val daily = events
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .withColumn("dow", Temporal.dowOf(col("day")))
    val w = Window.partitionBy("event_type", "dow")
    val scored = daily
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("__s1",
        sum(col("n").cast("decimal(38,0)")).over(w).cast("double"))
      .withColumn("__s2",
        // cast BEFORE the square: n*n in LONG overflows past ~3e9
        sum(col("n").cast("decimal(38,0)") * col("n")).over(w)
          .cast("double"))
      .withColumn("__mean", col("__s1") / col("__k"))
      .withColumn("__var",
        col("__s2") / col("__k") - col("__mean") * col("__mean"))
      .withColumn("z",
        when(col("__k") >= 2 && col("__var") > 0,
          round((col("n") - col("__mean")) / sqrt(col("__var")), 6)))
    scored
      .withColumn("baseline_mean", round(col("__mean"), 6))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        col("baseline_mean"), col("z"), col("is_anomaly"))
  }

  /** Half-life-decayed trending score per key: each event contributes
    * `2^(-age_days)` relative to the corpus's LAST day (half-life =
    * one day), so yesterday's burst counts half of today's — the
    * "trending now" ranking that a raw count window can't express
    * without a hard cutoff. Integer day ages keep every weight an
    * exact power of two (engine-identical products; 6dp absorbs sum
    * order). `asOfDay` defaults to the data's max day — computed by a
    * scalar subquery-style join, not a collect. Output: the top
    * `topK` keys by `(score DESC, key)`. */
  def trendingScore(events: DataFrame, keyCol: String,
      topK: Int = 100): DataFrame = {
    require(topK >= 1, s"bad topK: $topK")
    val daily = events.select(col(keyCol).as("__k"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .groupBy("__k", "day").agg(count(lit(1)).as("n"))
    val asOf = daily.agg(max("day").as("asof"))
    daily.crossJoin(broadcast(asOf))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum("n").as("n_events"),
        round(sum(col("n") *
          pow(lit(0.5), col("asof") - col("day"))), 6).as("score"))
      .orderBy(col("score").desc, col(keyCol))
      .limit(topK)
  }

  /** Day-of-week volume profile per event type with peak-day flags —
    * the seasonality fingerprint behind crawl scheduling and anomaly
    * baselines. Day-of-week is ENGINE-NEUTRAL integer math:
    * `(epochDay + 3) % 7` with 0 = Monday (epoch day 0 was a
    * Thursday), sidestepping the Spark-1=Sunday vs DuckDB-0=Sunday
    * convention trap entirely. `is_peak` marks the max-volume dow
    * (ties all flagged — deterministic, no arbitrary pick). One
    * map-only projection + one hash aggregate + a 7-row window. */
  def dowProfile(events: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type")
    events
      .select(col("event_type"),
        Temporal.dowOf(floor(unix_timestamp(col("ts")) / 86400))
          .as("dow"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n") / sum("n").over(byType).cast("double"), 6))
      .withColumn("is_peak", col("n") === max("n").over(byType))
  }

  /** Hard cap on per-user event count for [[attributionCredit]] —
    * the touch×conversion join's d² bound. */
  val MaxUserEvents = 50000L

  /** First-touch / last-touch conversion attribution — the marketing
    * readout: for every conversion event, which earlier touch (any
    * non-conversion event by the same user inside the lookback
    * window) gets the credit under each model. One row per touch
    * type: `(event_type, first_touch, last_touch)`, plus a
    * `(direct)` row for conversions with no in-window touch (both
    * models credit those identically).
    *
    * Ordering is the composite `(ts, event_id)` everywhere — a touch
    * precedes a conversion iff it is strictly earlier in composite
    * order, and first/last picks inside the window use the same
    * composite — so same-microsecond ties resolve deterministically
    * in both engines (timestamps compare as exact microsecond
    * integers; no epoch-float arithmetic anywhere).
    *
    * Scale shape: one equi-join on the user key (conversions ×
    * touches), with candidates bounded by per-user activity inside
    * the lookback window — never a cross join. A bot user with a
    * huge event count breaks that bound quadratically, so
    * [[Events.MaxUserEvents]] is enforced loudly up front (the
    * mannKendall series-length precedent): drop or sample bot users
    * upstream, don't let one key produce 10^10 join rows. */
  def attributionCredit(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      convType: String, lookbackDays: Int = 7): DataFrame = {
    require(lookbackDays >= 1, s"bad lookbackDays: $lookbackDays")
    val ev = events.select(col(userCol).as("__u"),
      col(tsCol).as("__ts"), col(idCol).as("__id"),
      col(typeCol).as("__ty"))
    val hot = ev.groupBy("__u").agg(count(lit(1)).as("n"))
      .filter(col("n") > MaxUserEvents)
      .orderBy(col("n").desc).limit(5).collect()
    require(hot.isEmpty,
      s"attributionCredit: user(s) over MaxUserEvents=$MaxUserEvents " +
        hot.map(r => s"${r.get(0)} (${r.getLong(1)})").mkString(", ") +
        " — the per-user touch×conversion join goes quadratic on bot " +
        "keys; filter or sample them upstream")
    // self-join over two filters of the same frame: rename EVERY
    // conversion-side column so no attribute is shared with the touch
    // side (the Spark self-join ambiguity trap)
    val conv = ev.filter(col("__ty") === convType)
      .select(col("__u").as("__cu"), col("__ts").as("__cts"),
        col("__id").as("__cid"))
    val touch = ev.filter(col("__ty") =!= convType)
    val joined = conv.join(touch,
      col("__cu") === col("__u") &&
        (col("__ts") < col("__cts") ||
          (col("__ts") === col("__cts") &&
            col("__id") < col("__cid"))) &&
        col("__ts") >= col("__cts") -
          expr(s"INTERVAL $lookbackDays DAYS"),
      "left")
      .select(col("__cu"), col("__cts"), col("__cid"), col("__ts"),
        col("__id"), col("__ty"))
    val byConv = Window.partitionBy("__cu", "__cid")
    val picked = joined
      .withColumn("__rf", row_number().over(
        byConv.orderBy(col("__ts").asc_nulls_last,
          col("__id").asc_nulls_last)))
      .withColumn("__rl", row_number().over(
        byConv.orderBy(col("__ts").desc_nulls_last,
          col("__id").desc_nulls_last)))
      .filter(col("__rf") === 1 || col("__rl") === 1)
    picked
      .groupBy(coalesce(col("__ty"), lit("(direct)")).as("event_type"))
      .agg(
        sum(when(col("__rf") === 1, 1L).otherwise(0L))
          .as("first_touch"),
        sum(when(col("__rl") === 1, 1L).otherwise(0L))
          .as("last_touch"))
      .orderBy("event_type")
  }

  /** Bounce rate per entry type — the share of sessions that open
    * with a type and end after that ONE event, the landing-quality
    * readout next to [[entryExitMatrix]]. Same gap-rule sessions and
    * composite `(ts, event_id)` tie order; all ratios are
    * integral-count fractions. */
  def bounceRate(events: DataFrame, gapSeconds: Long = 1800L)
      : DataFrame = {
    require(gapSeconds >= 1, s"bad gapSeconds: $gapSeconds")
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val sess = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), unix_timestamp(col("ts")).as("__es"))
      .withColumn("__prev", lag("__es", 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__es") - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("__sess", sum("__new").over(
        byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val bySess = Window.partitionBy("user_id", "__sess")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sess
      .withColumn("entry_type", first("event_type").over(bySess))
      .withColumn("__n_ev", count(lit(1)).over(bySess))
      .select("user_id", "__sess", "entry_type", "__n_ev")
      .distinct()
      .groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__n_ev") === 1, 1L).otherwise(0L))
          .as("n_bounced"))
      .withColumn("bounce_rate", round(col("n_bounced") /
        col("n_sessions").cast("double"), 6))
      .orderBy("entry_type")
  }

  /** Weekly growth accounting — the new / retained / resurrected /
    * churned user ledger behind every growth dashboard. Per calendar
    * week (anchored like [[weeklyRetention]]): users first seen that
    * week (`n_new`), users also active the immediately prior week
    * (`n_retained`), users returning after a gap (`n_resurrected`),
    * and users active the prior week who did not return
    * (`n_churned`, counted INTO the week they went missing; weeks
    * past the observation horizon get no churn row — absence after
    * the last observed week is censoring, not churn).
    *
    * All counts are integral from one distinct (user, week) frame +
    * one user-key window pass; the horizon bound is a broadcast
    * 1-row aggregate. */
  def growthAccounting(events: DataFrame,
      anchorEpoch: Long = 1704067200L): DataFrame = {
    val wu = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        floor((unix_timestamp(col("ts")) - anchorEpoch) / 604800.0)
          .cast("long").as("wk"))
      .distinct()
    val byU = Window.partitionBy("user_id").orderBy("wk")
    val tagged = wu
      .withColumn("__first",
        min("wk").over(Window.partitionBy("user_id")))
      .withColumn("__prev", lag("wk", 1).over(byU))
      .withColumn("__next", lead("wk", 1).over(byU))
    val statusCounts = tagged
      .groupBy(col("wk").as("week"))
      .agg(
        sum(when(col("wk") === col("__first"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("wk") =!= col("__first") &&
          col("__prev") === col("wk") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("wk") =!= col("__first") &&
          (col("__prev").isNull || col("__prev") =!= col("wk") - 1),
          1L).otherwise(0L)).as("n_resurrected"))
    val horizon = broadcast(wu.agg(max("wk").as("__mx")))
    val churn = tagged.crossJoin(horizon)
      .filter((col("__next").isNull ||
        col("__next") =!= col("wk") + 1) &&
        col("wk") + 1 <= col("__mx"))
      .groupBy((col("wk") + 1).as("week"))
      .agg(count(lit(1)).as("n_churned"))
    statusCounts.join(churn, Seq("week"), "full_outer")
      .select(col("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("week")
  }

  /** Session entry/exit matrix — which event type OPENS a session vs
    * which CLOSES it, the landing/exit-page analysis behind every
    * engagement dashboard. Sessions are the standard gap rule
    * (`gapSeconds` of epoch-second inactivity starts a new one, the
    * sessionize convention); first/last picks use the composite
    * `(ts, event_id)` order so same-instant ties are deterministic.
    * `share` is row-stochastic per entry type (the transitionMatrix
    * convention). Two user-key window exchanges then a K²-sized
    * aggregate. */
  def entryExitMatrix(events: DataFrame, gapSeconds: Long = 1800L)
      : DataFrame = {
    require(gapSeconds >= 1, s"bad gapSeconds: $gapSeconds")
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val sess = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), unix_timestamp(col("ts")).as("__es"))
      .withColumn("__prev", lag("__es", 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__es") - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("__sess", sum("__new").over(
        byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val bySess = Window.partitionBy("user_id", "__sess")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byEntry = Window.partitionBy("entry_type")
    sess
      .withColumn("entry_type", first("event_type").over(bySess))
      .withColumn("exit_type", last("event_type").over(bySess))
      // one row per session (every event of a session carries the
      // same entry/exit pair)
      .select("user_id", "__sess", "entry_type", "exit_type")
      .distinct()
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"))
      .withColumn("share", round(col("n_sessions") /
        sum("n_sessions").over(byEntry).cast("double"), 6))
      .orderBy("entry_type", "exit_type")
  }

  /** Bot-regularity heuristic per user: a human's inter-event gaps
    * are bursty, a cron job's are metronomic — so a LOW coefficient
    * of variation of the gap series over enough events is the classic
    * automation smell. Gaps are whole SECONDS (integral), the
    * sufficient statistics (n, Σg, Σg²) accumulate in decimal(38,0),
    * and mean/cv are exact-rational doubles — oracle-exact. Flags
    * `bot_like` when `n_events ≥ minEvents` and `cv ≤ maxCv` (a
    * zero-variance schedule is cv 0, the strongest signal). One
    * user-key shuffle (the lag window), one aggregate. Output:
    * `(user, n_events, mean_gap_s, cv, bot_like)` for users with at
    * least 2 events. */
  def botRegularity(df: DataFrame, userCol: String, tsCol: String,
      minEvents: Int = 20, maxCv: Double = 0.1): DataFrame = {
    require(minEvents >= 2, s"bad minEvents: $minEvents")
    require(maxCv > 0, s"bad maxCv: $maxCv")
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val gaps = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        unix_timestamp(col(tsCol)).as("__s"))
      .withColumn("__g", col("__s") -
        lag("__s", 1).over(Window.partitionBy("__u").orderBy("__s")))
      .filter(col("__g").isNotNull)
    val agg = gaps.groupBy(col("__u").as(userCol))
      .agg(count(lit(1)).as("__n"),
        sum(col("__g").cast("decimal(38,0)")).as("__sg"),
        sum(col("__g").cast("decimal(19,0)") *
          col("__g").cast("decimal(19,0)")).as("__qg"))
    val nd = col("__n").cast("decimal(20,0)")
    val mean = col("__sg").cast("double") / col("__n").cast("double")
    val vhat = (nd * col("__qg") - col("__sg") * col("__sg"))
      .cast("double") /
      (col("__n") * (col("__n") - 1)).cast("double")
    val cv = when(col("__n") > 1 && mean > 0, sqrt(vhat) / mean)
    // cv is undefined for a single gap or an all-zero gap series; the
    // latter (identical timestamps on >= minEvents events) is itself
    // the strongest automation signal, so it flags directly
    val metronomic = when(cv.isNotNull, cv <= maxCv)
      .otherwise(mean === 0.0)
    agg.select(col(userCol),
      (col("__n") + 1).as("n_events"),
      round(mean, 4).as("mean_gap_s"),
      round(cv, 6).as("cv"),
      (col("__n") + 1 >= minEvents && metronomic).as("bot_like"))
  }

  /** Agent-trace tool-call pairing QA — the structural lint for
    * agentic training traces (a `call` must be answered by the next
    * protocol event being its `result`; dangling calls and orphan
    * results are malformed episodes that corrupt tool-use
    * fine-tuning). Input: one row per protocol event with a role in
    * {call, result, other}; order within a trace is `(tsCol, idCol)`
    * — the id tiebreak makes simultaneous events deterministic.
    *
    * Per trace: call/result counts, `dangling_calls` (call NOT
    * immediately followed by a result), `orphan_results` (result not
    * immediately preceded by a call), and the `well_formed` flag.
    * One window per trace (lead + lag in a single pass), then one
    * hash aggregate — traces are the partition key, so skew is
    * bounded by the longest trace. */
  def toolCallPairingQa(df: DataFrame, traceCol: String, idCol: String,
      tsCol: String, roleCol: String): DataFrame = {
    val w = Window.partitionBy(traceCol).orderBy(col(tsCol), col(idCol))
    val flagged = df
      .withColumn("__next", lead(col(roleCol), 1).over(w))
      .withColumn("__prev", lag(col(roleCol), 1).over(w))
    flagged.groupBy(col(traceCol).as("trace"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col(roleCol) === "call", 1L).otherwise(0L))
          .as("n_calls"),
        sum(when(col(roleCol) === "result", 1L).otherwise(0L))
          .as("n_results"),
        sum(when(col(roleCol) === "call" &&
          (col("__next").isNull || col("__next") =!= "result"), 1L)
          .otherwise(0L)).as("dangling_calls"),
        sum(when(col(roleCol) === "result" &&
          (col("__prev").isNull || col("__prev") =!= "call"), 1L)
          .otherwise(0L)).as("orphan_results"))
      .withColumn("well_formed",
        col("dangling_calls") === 0 && col("orphan_results") === 0)
  }

  /** Semi-structured field statistics over a JSON string column —
    * the props/metadata audit every event pipeline runs before
    * trusting a field: per group, how many rows carry the path, and
    * the extracted integral value's sum/max. Extraction is
    * `get_json_object` (codegen'd, map-only); a malformed document or
    * a missing path reads NULL and counts as absent — identical
    * semantics to the oracle's json_extract_string. */
  def jsonFieldStats(events: DataFrame, groupCol: String,
      jsonCol: String, path: String): DataFrame = {
    val v = get_json_object(col(jsonCol), path).cast("long")
    events.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        count(v).as("n_with_field"),
        sum(v).as("sum_value"),
        max(v).as("max_value"))
  }

  /** Turn-alternation audit per stream — conversation-data QA: in a
    * well-formed chat log roles alternate, so two consecutive events
    * of the same type are a structure violation (dropped turn, double
    * send, merge artifact). Orders each stream by (ts, id) — the id
    * tiebreak keeps the walk deterministic under timestamp ties — and
    * counts `type == lag(type)` breaks. One window per stream + one
    * integral aggregate. */
  def turnAlternation(events: DataFrame, streamCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(streamCol)
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__same",
        when(col(typeCol) === lag(col(typeCol), 1).over(w), 1L)
          .otherwise(0L))
      .groupBy(col(streamCol))
      .agg(count(lit(1)).as("n_turns"),
        sum("__same").as("n_violations"))
      .withColumn("violation_rate",
        round(when(col("n_turns") > 1,
          col("n_violations").cast("double") / (col("n_turns") - 1))
          .otherwise(0.0), 6))
  }
}
