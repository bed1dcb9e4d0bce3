package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cross-column / cross-corpus statistics for curation monitoring.
  *
  * [[corrMatrix]] — all pairwise Pearson correlations of a set of
  * numeric columns in ONE scan + ONE single-row aggregate (the
  * feature-drift / redundancy check run before training-data mixing).
  * The reference's analogue is driver-side pandas peeking; here the
  * whole matrix is one wide partial-aggregated job whose shuffle
  * carries a single row of moments, so it costs the same at 100 TB as
  * a count(*). Formulated as `covar_pop / (stddev_pop * stddev_pop)`
  * — the exact pairing `q_source_trend` already proved cross-engine
  * (round 6dp absorbs last-ulp accumulation-order differences).
  *
  * [[jsDivergence]] — Jensen-Shannon divergence between each pair of
  * sources' unigram distributions, the standard corpus-shift metric
  * (symmetric, bounded [0,1] in log2). One corpus scan builds the
  * per-source token distribution; every downstream join is
  * vocabulary-sized and source-count-sized — corpus size never appears
  * again, which is what makes it a 100 TB-viable drift monitor. The
  * tiny pair frame broadcasts; the (s1, s2, tok) full-outer alignment
  * shuffles at most |vocab| x |pairs| rows. Terms with p=0 contribute
  * 0 by the usual KL convention (guarded CASE, not a NaN filter).
  */
object Stats {

  /** Long-form (x_col, y_col, corr) for every unordered column pair,
    * one single-row aggregate. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      val sa = stddev_pop(col(a).cast("double"))
      val sb = stddev_pop(col(b).cast("double"))
      // zero-variance guard: ANSI mode raises on /0; a constant column
      // has no defined correlation -> null (same CASE in the oracle)
      round(when(sa =!= 0.0 && sb =!= 0.0,
        covar_pop(col(a).cast("double"), col(b).cast("double")) /
          (sa * sb)), 6).as(s"${a}__${b}")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs
      .map { case (a, b) => s"'$a', '$b', `${a}__${b}`" }
      .mkString(", ")
    one.select(expr(
      s"stack(${pairs.size}, $stackArgs) AS (x_col, y_col, corr)"))
  }

  /** Per-source-pair JSD (log2, 6dp) over whitespace-token unigram
    * distributions of `textCol`. Output: (s1, s2, jsd) with s1 < s2. */
  def jsDivergence(df: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val counts = df
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source").agg(sum("c").as("t"))
    // vocab-sized from here on: |sources| is K, |counts| is K x vocab
    val p = counts.join(broadcast(totals), "source")
      .select(col("source"), col("tok"),
        (col("c").cast("double") / col("t")).as("p"))
    val srcs = totals.select(col("source"))
    val pairFrame = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("s1"), col("b.source").as("s2"))
    val left = broadcast(pairFrame)
      .join(p.withColumnRenamed("source", "s1")
        .withColumnRenamed("p", "pa"), Seq("s1"))
    val right = broadcast(pairFrame)
      .join(p.withColumnRenamed("source", "s2")
        .withColumnRenamed("p", "pb"), Seq("s2"))
    val aligned = left.join(right, Seq("s1", "s2", "tok"), "full_outer")
      .select(col("s1"), col("s2"),
        coalesce(col("pa"), lit(0.0)).as("pa"),
        coalesce(col("pb"), lit(0.0)).as("pb"))
    def term(pc: Column, other: Column): Column =
      when(pc > 0,
        pc * (log(lit(2.0) * pc / (pc + other)) / log(lit(2.0))))
        .otherwise(lit(0.0))
    aligned.groupBy("s1", "s2")
      .agg(round(
        lit(0.5) * sum(term(col("pa"), col("pb"))) +
          lit(0.5) * sum(term(col("pb"), col("pa"))), 6).as("jsd"))
  }

  /** Per-source Zipf fit: least-squares slope/intercept of
    * ln(freq) ~ ln(rank) over the source's token frequency table
    * (natural text sits near slope -1; templated/generated corpora
    * drift off — a cheap distribution-shape drift monitor).
    *
    * Rank is a DETERMINISTIC total order (count desc, token asc), so
    * both engines assign identical ranks. The window runs over the
    * vocab-sized frequency table, not the corpus; the regression is
    * the proven covar_pop/var_pop moment pairing, 6dp. Output:
    * (source, n_types, slope, intercept). */
  def zipfSlope(df: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val counts = df
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val ranked = counts.withColumn("rank",
      row_number().over(Window.partitionBy("source")
        .orderBy(col("c").desc, col("tok"))))
    ranked
      .select(col("source"),
        log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        // single-type source -> var_pop(x)=0: no defined slope (ANSI
        // would raise on the division); null on both engines
        round(when(var_pop(col("x")) =!= 0.0,
          covar_pop(col("x"), col("y")) / var_pop(col("x"))), 6)
          .as("slope"),
        round(when(var_pop(col("x")) =!= 0.0,
          avg(col("y")) -
            covar_pop(col("x"), col("y")) / var_pop(col("x")) *
              avg(col("x"))), 6).as("intercept"))
  }

  /** Exact WEIGHTED median per group — the primitive Spark lacks
    * (percentile_disc ignores weights; a token-weighted "median doc
    * length" must weight each doc by its token mass or the statistic
    * describes documents, not tokens). Type-1 semantics: the smallest
    * value whose cumulative weight reaches half the total — an actual
    * data value, exact on every engine.
    *
    * Shape: ONE shuffle on the group key; a value-ordered running-sum
    * window plus the group total, then a filter + min aggregate. Zero
    * or negative weights are excluded up front (they'd make the
    * cumulative non-monotone and the "half the total" target
    * meaningless). */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
      wCol: String): DataFrame = {
    val pos = df.filter(col(wCol) > 0)
    val byG = Window.partitionBy(groupCol)
    // RANGE up to the current VALUE (not row): ties on the value must
    // accumulate together, or the picked element would depend on
    // arbitrary intra-tie row order
    val ordered = byG.orderBy(col(valCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // Decimal accumulation: exact for fractional weights (to 9dp) and
    // order-independent, so the half-total threshold and the reported
    // total agree bit-for-bit with any engine's exact sum — a double
    // running sum would be summation-order-sensitive, a long cast
    // would silently truncate fractional weights.
    pos
      .withColumn("__cum",
        sum(col(wCol).cast("decimal(38,9)")).over(ordered))
      .withColumn("__tot",
        sum(col(wCol).cast("decimal(38,9)")).over(byG))
      // compare IN decimal: `__tot / 2.0` would promote both sides to
      // DOUBLE and forfeit the exactness the decimal sums just bought
      // for fractional weights — `cum * 2 >= tot` stays in decimal
      // (mirrored literally in the oracle SQL)
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(groupCol)
      .agg(min(col(valCol)).as("wmedian"),
        min(col("__tot")).cast("double").as("total_weight"))
  }

  /** One-sided CUSUM drift detector over an ordered per-group series —
    * "has this source's daily volume shifted up?" is the composition-
    * drift question a training-data pipeline monitors. The textbook
    * recursion `s_i = max(0, s_{i-1} + (x_i - mean - slack))` looks
    * sequential, but the reflection identity
    * `s_i = P_i - min(0, min_{j<=i} P_j)` (P = prefix sum of the
    * centered series) turns it into TWO ordered window passes — fully
    * distributed per group, and fully ANSI-replayable. Both engines
    * evaluate the running sums in the same value order, so the doubles
    * agree bit-for-bit before the 6dp round. Output: one row per
    * (group, t) with the cusum statistic and an `alarm` flag at
    * `threshold`. */
  def cusumShift(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, slack: Double = 0.0, threshold: Double = 3.0)
      : DataFrame = {
    val stats = df.groupBy(groupCol).agg(
      (sum(col(xCol).cast("double")) /
        count(lit(1)).cast("double")).as("__mean"),
      stddev_pop(col(xCol).cast("double")).as("__sd"))
    val w = Window.partitionBy(groupCol).orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `tCol` must be unique per group (a daily/hourly series is): the
    // ordered running sums are otherwise tie-order-dependent.
    // Zero-variance series standardize to 0 (no drift by definition),
    // never a division blow-up.
    df.join(broadcast(stats), groupCol)
      .withColumn("__y",
        when(col("__sd") > 0,
          (col(xCol).cast("double") - col("__mean")) / col("__sd") - slack)
          .otherwise(lit(-slack)))
      .withColumn("__p", sum("__y").over(w))
      .withColumn("__minp", min("__p").over(w))
      .withColumn("cusum",
        round(col("__p") - least(lit(0.0), col("__minp")), 6))
      .withColumn("alarm", col("cusum") > threshold)
      .select(col(groupCol), col(tCol), col(xCol), col("cusum"),
        col("alarm"))
  }

  /** Mann-Kendall trend test per group over an ordered series — the
    * nonparametric "is this source's volume genuinely trending?"
    * complement to [[cusumShift]] (CUSUM detects a level SHIFT,
    * Mann-Kendall a monotone trend, and neither assumes a
    * distribution). `S = Σ_{i<j} sign(x_j - x_i)`; variance with the
    * standard tie correction `[n(n-1)(2n+5) - Σ_t t(t-1)(2t+5)]/18`;
    * continuity-corrected `z = (S ∓ 1)/sqrt(var)`. Output per group:
    * `(n, s, z 6dp, trend ∈ {up, down, none})` at the two-sided 5%
    * level (|z| > 1.959964).
    *
    * Scale shape: the pair sum is a per-group self-join — quadratic in
    * the SERIES length (days, not rows), which is the operator's
    * contract: a monitoring series is bounded (30-365 points) while
    * the rows behind each point are unbounded; everything here is
    * integer/closed-form, so the result replays in ANSI SQL exactly.
    * `tCol` must be unique per group (a daily/hourly series is — the
    * [[cusumShift]] contract); a single-point group has no pairs and
    * is dropped (no trend is definable from one observation).
    *
    * The series-length contract is ENFORCED (the `MaxPreCells`
    * pattern): the longest group's length is checked with one cheap
    * aggregate BEFORE the quadratic join is scheduled, and a series
    * over [[MaxSeriesLen]] fails fast with the fix in the message —
    * on a 100 TB backfill an un-bucketed per-event `tCol` would
    * otherwise go quadratic in ROWS, not days. */
  val MaxSeriesLen = 5000

  /** Shared fail-fast for the quadratic series family ([[mannKendall]],
    * [[theilSen]]): one cheap per-group length aggregate runs BEFORE
    * the O(n²) pair join is scheduled, so an un-bucketed per-event
    * `tCol` on a 100 TB backfill dies with the fix in the message
    * instead of going quadratic in rows. */
  private def requireBoundedSeries(s: DataFrame, op: String,
      maxSeriesLen: Int): Unit = {
    require(maxSeriesLen >= 2, s"bad maxSeriesLen: $maxSeriesLen")
    val maxLen = Option(
      s.groupBy("__g").agg(count(lit(1)).as("__len"))
        .agg(max(col("__len"))).head.get(0)).fold(0L)(
        _.asInstanceOf[Long])
    require(maxLen <= maxSeriesLen,
      s"$op: longest group has $maxLen series points " +
        s"(> maxSeriesLen=$maxSeriesLen) — the pair join is " +
        "quadratic in series length; bucket the series first (e.g. " +
        "one point per day: groupBy(day).agg(...) before calling)")
  }

  def mannKendall(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, maxSeriesLen: Int = MaxSeriesLen): DataFrame = {
    val s = df.select(col(groupCol).as("__g"), col(tCol).as("__t"),
      col(xCol).cast("double").as("__x"))
    requireBoundedSeries(s, "mannKendall", maxSeriesLen)
    val pairs = s.as("a").join(s.as("b"),
        col("a.__g") === col("b.__g") && col("a.__t") < col("b.__t"))
      .groupBy(col("a.__g").as("__g"))
      .agg(sum(signum(col("b.__x") - col("a.__x")).cast("long"))
        .as("__s"))
    val ties = s.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("__tc"))
      .groupBy("__g")
      .agg(
        sum(col("__tc") * (col("__tc") - 1) * (lit(2) * col("__tc") + 5))
          .as("__tiecorr"),
        sum(col("__tc")).as("__n"))
    val z975 = 1.959964
    pairs.join(ties, "__g")
      .withColumn("__var",
        (col("__n") * (col("__n") - 1) * (lit(2) * col("__n") + 5) -
          col("__tiecorr")).cast("double") / 18.0)
      .withColumn("z",
        when(col("__var") <= 0, lit(0.0))
          .when(col("__s") > 0,
            round((col("__s") - 1) / sqrt(col("__var")), 6))
          .when(col("__s") < 0,
            round((col("__s") + 1) / sqrt(col("__var")), 6))
          .otherwise(lit(0.0)))
      .withColumn("trend",
        when(col("z") > z975, lit("up"))
          .when(col("z") < -z975, lit("down"))
          .otherwise(lit("none")))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("__s").as("s"), col("z"), col("trend"))
  }

  /** Benford first-digit audit of a positive numeric column per group —
    * the classic fabricated/synthetic-data smell test (organic
    * financial/size data follows `P(d) = log10(1 + 1/d)`; generated or
    * truncated data usually does not). Output per (group, digit):
    * observed count, observed fraction, Benford expectation, absolute
    * deviation (all 6dp).
    *
    * The first digit is taken from the DECIMAL STRING of
    * `floor(value)` for values >= 1 — string extraction is
    * bit-exactly replayable on any engine, where a log10-based digit
    * would flip on last-ulp differences right at powers of ten.
    * Values < 1 are excluded by contract (documented, not silently
    * kept). One scan, one (group x 9)-row aggregate — 100 TB cost is
    * the scan. */
  def benfordDigits(df: DataFrame, groupCol: String, xCol: String)
      : DataFrame = {
    val d1 = substring(floor(col(xCol)).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = df.filter(col(xCol) >= 1)
      .groupBy(col(groupCol), d1.as("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(groupCol)
    counts
      .withColumn("frac",
        round(col("n") / sum(col("n")).over(totals), 6))
      .withColumn("expected",
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("abs_dev", round(abs(col("frac") - col("expected")), 6))
      .select(col(groupCol), col("digit"), col("n"), col("frac"),
        col("expected"), col("abs_dev"))
  }

  /** Theil–Sen slope per group over an ordered series — the robust
    * (median-of-pair-slopes) trend MAGNITUDE estimator that pairs with
    * [[mannKendall]]'s trend TEST: MK says "is it trending", Theil–Sen
    * says "by how much per time unit", and both survive outliers a
    * least-squares fit cannot. `slope = median{(x_j-x_i)/(t_j-t_i)}`
    * over all i<j pairs, with the type-1 discrete median (an actual
    * pair's slope, never an interpolation — the `percentile_disc` /
    * `quantile_disc` cross-engine pairing). Both engines compute each
    * slope with the identical two-operand IEEE division, so the order
    * statistics agree bit-for-bit before the 6dp output round.
    *
    * Scale shape: same contract as [[mannKendall]] — the pair join is
    * quadratic in the SERIES length (days, not rows) and the
    * [[requireBoundedSeries]] fail-fast enforces it. */
  def theilSen(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, maxSeriesLen: Int = MaxSeriesLen): DataFrame = {
    val s = df.select(col(groupCol).as("__g"),
      col(tCol).cast("double").as("__t"),
      col(xCol).cast("double").as("__x"))
    requireBoundedSeries(s, "theilSen", maxSeriesLen)
    s.as("a").join(s.as("b"),
        col("a.__g") === col("b.__g") && col("a.__t") < col("b.__t"))
      .select(col("a.__g").as("__g"),
        ((col("b.__x") - col("a.__x")) /
          (col("b.__t") - col("a.__t"))).as("__slope"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __slope)")
          .as("__med"))
      .select(col("__g").as(groupCol), col("n_pairs"),
        round(col("__med"), 6).as("slope"))
  }

  /** Truncated exponentially-weighted moving average per group — the
    * smoothing primitive behind every volume/quality dashboard line.
    * Calendar-gap weighting: the value at `t` averages the points in
    * `(t-windowLen, t]` with weight `(1-alpha)^(t-t_j)`, so missing
    * days decay by CALENDAR distance, not row position (a row-lagged
    * EWMA silently speeds up over gaps). The default `alpha = 0.5`
    * makes every weight an exact power of two — bit-representable on
    * any IEEE engine — and the 6dp round absorbs summation order.
    *
    * Scale shape: a per-group range self-join bounded by `windowLen`
    * per output row — LINEAR in series length with a constant-bounded
    * fan-out (required <= 3650), one group-key shuffle, no window
    * tail growth. */
  def ewmaSmooth(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, alpha: Double = 0.5, windowLen: Int = 28)
      : DataFrame = {
    require(alpha > 0 && alpha < 1, s"bad alpha: $alpha")
    require(windowLen >= 1 && windowLen <= 3650,
      s"bad windowLen: $windowLen (the join fan-out is windowLen-bounded)")
    val s = df.select(col(groupCol).as("__g"),
      col(tCol).cast("long").as("__t"),
      col(xCol).cast("double").as("__x"))
    s.as("a").join(s.as("b"),
        col("a.__g") === col("b.__g") &&
          col("b.__t") <= col("a.__t") &&
          col("b.__t") > col("a.__t") - windowLen)
      .groupBy(col("a.__g").as("__g"), col("a.__t").as("__t"),
        col("a.__x").as("__x"))
      .agg((sum(col("b.__x") *
          pow(lit(1.0 - alpha), col("a.__t") - col("b.__t"))) /
        sum(pow(lit(1.0 - alpha), col("a.__t") - col("b.__t"))))
        .as("__e"))
      .select(col("__g").as(groupCol), col("__t").as(tCol),
        col("__x").as(xCol), round(col("__e"), 6).as("ewma"))
  }

  /** Gini concentration of a non-negative measure per group — "is 90%
    * of this source's volume three boilerplate templates?" is the
    * inequality question behind dedup prioritization and crawl-budget
    * audits. Closed rank form `G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n`
    * with `i` the ascending value rank; equal values commute inside
    * the rank sum (the tie block contributes `x·Σi` regardless of
    * intra-tie order), so arbitrary tie order cannot change the
    * result. Sums accumulate in decimal(38,0)-exact integer space for
    * integral measures; the single double expression at the edge is
    * deterministic on any IEEE engine.
    *
    * One rank window + one aggregate per group — a single group-key
    * shuffle, no joins, no collect. */
  def giniConcentration(df: DataFrame, groupCol: String, xCol: String)
      : DataFrame = {
    val pos = df.filter(col(xCol).isNotNull && col(xCol) >= 0)
    val w = Window.partitionBy(groupCol).orderBy(col(xCol))
    pos
      .withColumn("__i", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col(xCol).cast("decimal(38,0)")).as("__sx"),
        // cast BEFORE the multiply: rank × value in the native integer
        // type could overflow long at corpus scale
        sum(col(xCol).cast("decimal(38,0)") * col("__i")).as("__six"))
      .withColumn("gini",
        when(col("__sx") > 0,
          round(lit(2.0) * col("__six").cast("double") /
            (col("n") * col("__sx").cast("double")) -
            (col("n") + lit(1.0)) / col("n"), 6))
          .otherwise(lit(0.0)))
      .select(col(groupCol), col("n"), round(
        col("__sx").cast("double"), 2).as("total"), col("gini"))
  }

  /** Single change-point per group by binary segmentation — "WHEN did
    * this source's volume shift?" where [[cusumShift]] answers
    * "did it shift at all". For every split after ordered point `i`,
    * the variance-reduction gain collapses (via the SSE identity) to
    * `sumL²/nL + sumR²/nR − S²/N` — prefix sums only, no means, no
    * residual pass; the reported split maximizes the gain with
    * earliest-time tie-break. Integral series keep every prefix sum
    * exactly representable, so both engines see identical doubles and
    * the argmax is deterministic; gains and segment means round 6dp
    * at the edge only.
    *
    * Two ordered windows + one rank per group — one group-key
    * shuffle, linear in series length. A single-point group has no
    * admissible split and is dropped. */
  def changePoint(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val s = df.select(col(groupCol).as("__g"), col(tCol).as("__t"),
      col(xCol).cast("double").as("__x"))
    val byG = Window.partitionBy("__g")
    val ord = byG.orderBy("__t")
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val scored = s
      .withColumn("__nl", row_number().over(ord).cast("double"))
      .withColumn("__sl", sum("__x").over(cum))
      .withColumn("__n", count(lit(1)).over(byG).cast("double"))
      .withColumn("__s", sum("__x").over(byG))
      .filter(col("__nl") < col("__n")) // right segment must be nonempty
      .withColumn("__gain",
        col("__sl") * col("__sl") / col("__nl") +
          (col("__s") - col("__sl")) * (col("__s") - col("__sl")) /
            (col("__n") - col("__nl")) -
          col("__s") * col("__s") / col("__n"))
    scored
      .withColumn("__rk", row_number().over(
        byG.orderBy(col("__gain").desc, col("__t"))))
      .filter(col("__rk") === 1)
      .select(col("__g").as(groupCol), col("__t").as("split_t"),
        round(col("__gain"), 6).as("gain"),
        round(col("__sl") / col("__nl"), 6).as("mean_left"),
        round((col("__s") - col("__sl")) / (col("__n") - col("__nl")), 6)
          .as("mean_right"),
        col("__n").cast("long").as("n"))
  }

  /** Two-proportion z-test over experiment variants — the ship/no-ship
    * primitive of every A/B readout. Input: one row per UNIT with its
    * variant and converted flag (dedupe upstream — a unit must count
    * once). Every unordered variant pair gets the pooled two-sample
    * z: `z = (p_a-p_b) / sqrt(p̂(1-p̂)(1/n_a+1/n_b))`, flagged at the
    * two-sided 5% level. All counts are integers; the z is one
    * deterministic double expression, 6dp at the edge.
    *
    * One corpus aggregate to variant-sized counts; the pair join runs
    * on the variant frame (V² for V variants — V is single digits by
    * design of any real experiment). */
  def abTestProportions(df: DataFrame, variantCol: String,
      convCol: String): DataFrame = {
    val v = df.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col(convCol).cast("int").cast("long")).as("conv"))
    val z975 = 1.959964
    v.as("a").join(v.as("b"), col("a.variant") < col("b.variant"))
      .withColumn("p_a", col("a.conv").cast("double") / col("a.n"))
      .withColumn("p_b", col("b.conv").cast("double") / col("b.n"))
      .withColumn("__pp",
        (col("a.conv") + col("b.conv")).cast("double") /
          (col("a.n") + col("b.n")))
      .withColumn("z",
        when(col("__pp") > 0 && col("__pp") < 1,
          round((col("p_a") - col("p_b")) /
            sqrt(col("__pp") * (lit(1.0) - col("__pp")) *
              (lit(1.0) / col("a.n") + lit(1.0) / col("b.n"))), 6))
          .otherwise(lit(0.0)))
      .select(col("a.variant").as("variant_a"),
        col("b.variant").as("variant_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        col("z"), (abs(col("z")) > z975).as("significant"))
  }

  /** Population Stability Index per group between two slices of a
    * numeric column over a DECLARED fixed-width grid —
    * `PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b)`, the industry-standard
    * "did this feature's distribution move between snapshots" monitor
    * with its conventional bands (< 0.1 stable, < 0.25 moderate, else
    * major). Bins empty on ONE side are excluded from the sum (the
    * deterministic convention — an eps fudge would make the result
    * depend on an arbitrary constant) and their count is REPORTED
    * (`n_onesided`) so a mass migration into brand-new bins is
    * visible, not silently dropped. One hash aggregate to the
    * (group, slice, bin) frame; bins-sized after. */
  def psiDrift(df: DataFrame, groupCol: String, sliceCol: String,
      xCol: String, width: Double): DataFrame = {
    require(width > 0, s"bad width: $width")
    val cells = df.filter(col(xCol).isNotNull && col(sliceCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        floor(col(xCol).cast("double") / width).cast("long").as("__bin"))
      .agg(sum(when(col(sliceCol), 1L).otherwise(0L)).as("ca"),
        sum(when(!col(sliceCol), 1L).otherwise(0L)).as("cb"))
    val byG = Window.partitionBy("__g")
    val p = cells
      .withColumn("na", sum("ca").over(byG))
      .withColumn("nb", sum("cb").over(byG))
      // guards wrap the DIVISIONS (ANSI divide-by-zero is eager in a
      // plain projection — the ks2Sample lesson); an all-one-slice
      // group only ever reads these through the both-sided CASE, so
      // the nulls are unreachable downstream
      .withColumn("pa", when(col("na") > 0,
        col("ca") / col("na").cast("double")))
      .withColumn("pb", when(col("nb") > 0,
        col("cb") / col("nb").cast("double")))
    p.groupBy("__g")
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
          .as("n_bins_common"),
        sum(when((col("ca") > 0) =!= (col("cb") > 0), 1L).otherwise(0L))
          .as("n_onesided"),
        round(sum(when(col("ca") > 0 && col("cb") > 0,
          (col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .otherwise(lit(0.0))), 6).as("psi"))
      .withColumn("band",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("major"))
      .select(col("__g").as(groupCol), col("n_a"), col("n_b"),
        col("n_bins_common"), col("n_onesided"), col("psi"),
        col("band"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group —
    * `D = max_v |F_a(v) − F_b(v)|`, the nonparametric "same
    * distribution?" test that needs NO binning (the sharp complement
    * of [[psiDrift]]'s banded monitor). ECDF steps are evaluated at
    * the distinct values via value-level counts + one cumulative
    * window, so ties are exact and the whole test is one sort shuffle
    * on the (group, value) frame — never a collect. Flagged at the
    * asymptotic 5% level (`c = 1.358·sqrt((n_a+n_b)/(n_a·n_b))`).
    * Integral-scaled counts keep the cum ratios deterministic; 6dp. */
  def ks2Sample(df: DataFrame, groupCol: String, sliceCol: String,
      xCol: String): DataFrame = {
    val vals = df.filter(col(xCol).isNotNull && col(sliceCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        col(xCol).cast("double").as("__x"))
      .agg(sum(when(col(sliceCol), 1L).otherwise(0L)).as("ca"),
        sum(when(!col(sliceCol), 1L).otherwise(0L)).as("cb"))
    val byG = Window.partitionBy("__g")
    val cum = byG.orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals
      .withColumn("na", sum("ca").over(byG))
      .withColumn("nb", sum("cb").over(byG))
      // the ANSI-mode guard must wrap the DIVISION, not just the
      // output: divide-by-zero throws before any later CASE could hide
      // the NaN
      .withColumn("__d", when(col("na") > 0 && col("nb") > 0, abs(
        sum("ca").over(cum) / col("na").cast("double") -
          sum("cb").over(cum) / col("nb").cast("double"))))
      .groupBy("__g")
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        round(max("__d"), 6).as("__ks"))
      // an empty slice has no ECDF: null stat, no flag (the guard also
      // keeps the double division from manufacturing a NaN max)
      .withColumn("ks_stat",
        when(col("n_a") > 0 && col("n_b") > 0, col("__ks")))
      // n_a cast double BEFORE the product: a LONG n_a*n_b overflows
      // at corpus-scale slice counts (the chiSquare marginal lesson)
      .withColumn("critical",
        when(col("n_a") > 0 && col("n_b") > 0,
          round(lit(1.358) * sqrt((col("n_a") + col("n_b")) /
            (col("n_a").cast("double") * col("n_b"))), 6)))
      .withColumn("significant",
        coalesce(col("ks_stat") > col("critical"), lit(false)))
      .select(col("__g").as(groupCol), col("n_a"), col("n_b"),
        col("ks_stat"), col("critical"), col("significant"))
  }

  /** Chi-square independence test between two categoricals (is
    * priority independent of status? is lang independent of source?) —
    * the categorical drift/leakage check. Zero cells matter:
    * `(0−e)²/e = e`, and summing `e` over every absent cell equals
    * `N − Σ_observed e`, so
    * `χ² = Σ_obs((o−e)²/e − e) + N` needs only the OBSERVED cell
    * frame — no dense R×C materialization. Also reports Cramér's V
    * (`sqrt(χ²/(N·min(R−1,C−1)))`, the effect size a huge-N χ²
    * always needs next to it). One corpus aggregate to the observed
    * cells; everything after is cells-sized. */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("__a").agg(sum("o").as("na"))
    val rb = cells.groupBy("__b").agg(sum("o").as("nb"))
    val totals = cells.agg(sum("o").as("nn"))
    val joined = cells.join(broadcast(ra), "__a")
      .join(broadcast(rb), "__b")
      .crossJoin(broadcast(totals))
    // na first to double: a BIGINT na*nb product would overflow at
    // corpus-scale marginals (the oracle mirrors the same cast order)
    val e = col("na").cast("double") * col("nb") / col("nn")
    val agg = joined.agg(
      sum(col("o")).as("n"),
      count_distinct(col("__a")).as("r"),
      count_distinct(col("__b")).as("c"),
      sum((col("o") - e) * (col("o") - e) / e - e).as("__t"))
    agg
      .withColumn("dof", (col("r") - 1) * (col("c") - 1))
      .withColumn("chi2", round(col("__t") + col("n"), 6))
      .withColumn("cramers_v",
        when(col("dof") > 0,
          round(sqrt((col("__t") + col("n")) /
            (col("n") * least(col("r") - 1, col("c") - 1))), 6))
          .otherwise(lit(0.0)))
      .select(col("n"), col("dof"), col("chi2"), col("cramers_v"))
  }

  /** Functional-dependency audit: does `lhsCol` determine `rhsCol`?
    * One summary row: lhs-key counts, keys violating the FD (more
    * than one distinct rhs), and the CONFLICTING-ROW count (rows
    * outside their key's modal rhs — the rows a repair would touch;
    * only the modal COUNT matters, so rhs ties need no break). The
    * schema-inference / join-key sanity check run before trusting a
    * column as a key. Two hash aggregates on (lhs, rhs) — the cell
    * frame — then key-sized reductions; corpus size appears once. */
  def fdViolations(df: DataFrame, lhsCol: String, rhsCol: String)
      : DataFrame = {
    val cells = df.filter(col(lhsCol).isNotNull)
      .groupBy(col(lhsCol).as("__l"), col(rhsCol).as("__r"))
      .agg(count(lit(1)).as("n"))
    val perKey = cells.groupBy("__l")
      .agg(sum("n").as("rows"),
        count(lit(1)).as("n_rhs"),
        max(col("n")).as("modal_n"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
        .as("violating_keys"),
      sum(col("rows")).as("n_rows"),
      sum(col("rows") - col("modal_n")).as("conflicting_rows"))
      .withColumn("fd_holds", col("violating_keys") === 0L)
      .withColumn("violation_rate",
        round(col("conflicting_rows") / col("n_rows").cast("double"), 6))
  }

  /** Per-group OLS line `y = a + b·x` with R² — the parametric
    * complement of [[theilSen]] (least squares is sharper when the
    * noise is well-behaved; Theil–Sen survives when it is not —
    * dashboards want both). `b = covar_pop/var_pop`,
    * `a = ȳ − b·x̄`, `R² = corr²` via the proven
    * `covar_pop/(stddev_pop·stddev_pop)` pairing; constant-x groups
    * get null slope/intercept/r2. ONE aggregate over the rows — the
    * moments shuffle, never the data. */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val b = covar_pop(x, y) / var_pop(x)
    val r = covar_pop(x, y) / (stddev_pop(x) * stddev_pop(y))
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(when(var_pop(x) =!= 0.0, b), 6).as("slope"),
        round(when(var_pop(x) =!= 0.0, avg(y) - b * avg(x)), 6)
          .as("intercept"),
        round(when(var_pop(x) =!= 0.0 && stddev_pop(y) =!= 0.0, r * r),
          6).as("r2"))
  }

  /** Pairwise VOCABULARY Jaccard between sources — the set-overlap
    * complement of [[jsDivergence]]'s distributional distance (two
    * sources can share every token yet weight them oppositely, and
    * vice versa; drift triage wants both axes). One corpus pass to
    * the distinct (source, token) frame; the intersection join and
    * the size join are vocab- x source-sized. Pairs with ZERO shared
    * tokens are absent (sparse output by design — at corpus scale the
    * all-pairs zero matrix is noise). */
  def vocabOverlap(df: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val v = graft.operators.TrackedCaches.persist(
      df.select(col(sourceCol).as("src"),
          explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .distinct())
    val sizes = v.groupBy("src").agg(count(lit(1)).as("sz"))
    v.as("a").join(v.as("b"),
        col("a.tok") === col("b.tok") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("s1"), col("b.src").as("s2"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("src").as("s1"),
        col("sz").as("sz1"))), "s1")
      .join(broadcast(sizes.select(col("src").as("s2"),
        col("sz").as("sz2"))), "s2")
      .select(col("s1"), col("s2"), col("sz1"), col("sz2"),
        col("inter"),
        round(col("inter") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Fano factor (index of dispersion, `var_pop / mean`) of an
    * INTEGRAL series per group — the burstiness read on daily volumes:
    * Poisson arrivals sit at 1, a bursty source (spiky crawls,
    * replayed batches) far above, a quota-throttled one below. Both
    * moments come from decimal-exact integer sums (`Σx`, `Σx²`) so the
    * one double expression at the edge is engine-identical — no
    * one-pass variance accumulator whose order could differ. */
  def fanoFactor(df: DataFrame, groupCol: String, xCol: String)
      : DataFrame = {
    val x = col(xCol).cast("long")
    df.filter(col(xCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(x.cast("decimal(38,0)")).cast("double").as("__s1"),
        // cast BEFORE the square: x*x in LONG overflows past ~3e9
        // (the giniConcentration cast-order convention)
        sum(x.cast("decimal(38,0)") * x).cast("double").as("__s2"))
      .withColumn("__mean", col("__s1") / col("n_obs"))
      .withColumn("__var",
        col("__s2") / col("n_obs") - col("__mean") * col("__mean"))
      .withColumn("mean", round(col("__mean"), 6))
      .withColumn("fano",
        when(col("__mean") > 0, round(col("__var") / col("__mean"), 6))
          .otherwise(lit(0.0)))
      .withColumn("bursty", col("fano") > 1.0)
      .select(col(groupCol), col("n_obs"), col("mean"), col("fano"),
        col("bursty"))
  }

  /** Sample autocorrelation at lags `1..maxLag` per group — "is this
    * source's volume weekly-periodic or a random walk?" feeds both the
    * seasonality profile and anomaly thresholds. Defined as the
    * Pearson correlation of the PAIRED `(x_t, x_{t+lag})` series over
    * exactly the pairs where both endpoints exist, so calendar gaps
    * drop pairs instead of fabricating zeros. Uses the
    * `covar_pop / (stddev_pop · stddev_pop)` pairing [[corrMatrix]]
    * proved cross-engine, zero-variance guarded, 6dp at the edge.
    *
    * Scale shape: the lag join is a maxLag-bounded range self-join on
    * the SERIES (days, not rows) — fan-out <= maxLag per point, one
    * group-key shuffle; [[requireBoundedSeries]] enforces the series
    * bound upstream of the join. */
  def acf(df: DataFrame, groupCol: String, tCol: String, xCol: String,
      maxLag: Int = 7, maxSeriesLen: Int = MaxSeriesLen): DataFrame = {
    require(maxLag >= 1 && maxLag <= 365, s"bad maxLag: $maxLag")
    val s = df.select(col(groupCol).as("__g"),
      col(tCol).cast("long").as("__t"),
      col(xCol).cast("double").as("__x"))
    requireBoundedSeries(s, "acf", maxSeriesLen)
    val sa = stddev_pop(col("x0"))
    val sb = stddev_pop(col("x1"))
    s.as("a").join(s.as("b"),
        col("a.__g") === col("b.__g") &&
          col("b.__t") > col("a.__t") &&
          col("b.__t") <= col("a.__t") + maxLag)
      .select(col("a.__g").as("__g"),
        (col("b.__t") - col("a.__t")).as("lag"),
        col("a.__x").as("x0"), col("b.__x").as("x1"))
      .groupBy("__g", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        round(when(sa =!= 0.0 && sb =!= 0.0,
          covar_pop(col("x0"), col("x1")) / (sa * sb)), 6).as("acf"))
      .select(col("__g").as(groupCol), col("lag"), col("n_pairs"),
        col("acf"))
  }

  /** Kendall's tau-b rank correlation per group — the tie-aware rank
    * agreement two scorers/judges/rankers get compared by (Spearman's
    * complement: tau counts pairwise inversions, so it is the one to
    * quote for top-k ranking stability). Computed exactly from the
    * O(m^2) within-group pair join, which is why the group size is a
    * HARD enforced cap, not advice: rows beyond `maxPerGroup` (in
    * deterministic (idCol) order) are rejected loudly — at corpus
    * scale you compare rankings of bounded k, never unbounded groups.
    * All four pair counts are integral; tau-b's one division is the
    * only float.
    *
    * tau_b = (nc - nd) / sqrt((n0 - tx) * (n0 - ty)), n0 = m(m-1)/2,
    * tx/ty = pairs tied in x / in y (both-tied counted in each). */
  def kendallTauB(df: DataFrame, groupCol: String, idCol: String,
      xCol: String, yCol: String, maxPerGroup: Int = 1000)
      : DataFrame = {
    require(maxPerGroup >= 2 && maxPerGroup <= 10000,
      s"bad maxPerGroup: $maxPerGroup (pairs grow as its square)")
    val s = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    // enforced cap with a loud witness (the hub-cap convention)
    val over = s.groupBy("__g").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxPerGroup).limit(3).collect()
    require(over.isEmpty,
      s"kendallTauB: group(s) over maxPerGroup=$maxPerGroup: " +
        over.map(r => s"${r.get(0)}=${r.getLong(1)}").mkString(", ") +
        " — rank a bounded top-k per group first")
    val a = s.select(col("__g"), col("__id").as("__ia"),
      col("__x").as("__xa"), col("__y").as("__ya"))
    val b = s.select(col("__g"), col("__id").as("__ib"),
      col("__x").as("__xb"), col("__y").as("__yb"))
    val dx = col("__xa") - col("__xb")
    val dy = col("__ya") - col("__yb")
    val pairs = a.join(b, Seq("__g")).filter(col("__ia") < col("__ib"))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n0"),
        sum(when(dx * dy > 0, 1L).otherwise(0L)).as("nc"),
        sum(when(dx * dy < 0, 1L).otherwise(0L)).as("nd"),
        sum(when(dx === 0, 1L).otherwise(0L)).as("tx"),
        sum(when(dy === 0, 1L).otherwise(0L)).as("ty"))
    pairs.withColumn("tau_b",
        when((col("n0") > col("tx")) && (col("n0") > col("ty")),
          round((col("nc") - col("nd")).cast("double") /
            sqrt((col("n0") - col("tx")).cast("double") *
              (col("n0") - col("ty")).cast("double")), 6)))
      .select(groupCol, "n0", "nc", "nd", "tx", "ty", "tau_b")
  }

  /** Spearman rank correlation per group with AVERAGE-RANK ties (the
    * textbook convention — `rank() + (|tie block| - 1)/2` is the mean
    * of the positions a tie block occupies), then the proven
    * `covar_pop / (stddev_pop · stddev_pop)` Pearson on the ranks.
    * The monotone-association complement of [[corrMatrix]]'s linear
    * Pearson: outlier-immune, captures any monotone link. Average
    * ranks are exact small doubles (k + 0.5), so both engines rank
    * identically; 6dp absorbs moment accumulation order.
    *
    * Two rank windows + one aggregate — a single group-key shuffle,
    * no joins, no collect. */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val s = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    def avgRank(c: String): Column =
      rank().over(Window.partitionBy("__g").orderBy(col(c)))
        .cast("double") +
        (count(lit(1)).over(Window.partitionBy("__g", c)).cast("double") -
          1.0) / 2.0
    val ranked = s.withColumn("__rx", avgRank("__x"))
      .withColumn("__ry", avgRank("__y"))
    val sx = stddev_pop(col("__rx"))
    val sy = stddev_pop(col("__ry"))
    ranked.groupBy("__g")
      .agg(count(lit(1)).as("n"),
        round(when(sx =!= 0.0 && sy =!= 0.0,
          covar_pop(col("__rx"), col("__ry")) / (sx * sy)), 6)
          .as("rho"))
      .select(col("__g").as(groupCol), col("n"), col("rho"))
  }

  /** Mutual information between two categorical columns — the
    * feature-redundancy / leakage detector: how many nats knowing X
    * buys about Y. One row: `(n, h_x, h_y, h_xy, mi, nmi)` with
    * `nmi = mi / sqrt(h_x·h_y)` (the sqrt normalization, 0 when
    * either marginal is constant).
    *
    * Exactness: one corpus aggregate to the K² contingency frame;
    * every probability is an integral-count ratio, every log term is
    * evaluated as `ln c + ln n − ln c_x − ln c_y` (pure doubles, no
    * count multiplication — `c·n` would overflow BIGINT at corpus
    * scale), and the K²-term float sums are absorbed by 6dp.
    *
    * Scale shape: one hash aggregate + classes-sized BROADCAST joins
    * for the marginals (the chiSquareIndependence pattern — never a
    * global window over the cell frame, never a second corpus
    * pass). */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("string").as("__x"),
        col(yCol).cast("string").as("__y"))
      .agg(count(lit(1)).as("c"))
    val mx = cells.groupBy("__x").agg(sum("c").as("cx"))
    val my = cells.groupBy("__y").agg(sum("c").as("cy"))
    val tot = cells.agg(sum("c").as("n"))
    val withMarg = cells.join(broadcast(mx), "__x")
      .join(broadcast(my), "__y")
      .crossJoin(broadcast(tot))
    val p = col("c") / col("n").cast("double")
    val agg = withMarg.agg(
      max("n").as("n"),
      sum(p * (log(col("c").cast("double")) +
        log(col("n").cast("double")) -
        log(col("cx").cast("double")) -
        log(col("cy").cast("double")))).as("__mi"),
      sum(p * (log(col("n").cast("double")) -
        log(col("c").cast("double")))).as("__hxy"),
      // marginal entropies straight off the cell frame:
      // Σ_cells p(x,y)·ln(n/c_x) telescopes to Σ_x p(x)·ln(1/p(x))
      sum(p * (log(col("n").cast("double")) -
        log(col("cx").cast("double")))).as("__hx"),
      sum(p * (log(col("n").cast("double")) -
        log(col("cy").cast("double")))).as("__hy"))
    agg.select(col("n"),
      round(col("__hx"), 6).as("h_x"),
      round(col("__hy"), 6).as("h_y"),
      round(col("__hxy"), 6).as("h_xy"),
      round(col("__mi"), 6).as("mi"),
      round(when(col("__hx") > 0 && col("__hy") > 0,
        col("__mi") / sqrt(col("__hx") * col("__hy")))
        .otherwise(lit(0.0)), 6).as("nmi"))
  }

  /** Lead-lag cross-correlation between two daily series from the
    * same long frame — "does signup volume LEAD purchase volume?".
    * For every lag in `[-maxLag, maxLag]`, Pearson correlation of
    * `A(day)` against `B(day + lag)` over the days both exist, plus
    * an `is_best` flag on the (correlation, lag) argmax. Lags where
    * the shifted series never overlap emit no row; a 1-day overlap
    * emits `(lag, 1, null)`.
    *
    * Exactness: the six correlation moments are integral sums
    * (products in decimal(38,0) — corpus-scale daily counts square
    * past BIGINT), so corr is one float expression; the argmax
    * compares those floats with a lag tie-break, deterministic on
    * both engines. Scale shape: the A side expands by (2·maxLag+1)
    * literal lags (days-sized × lags, bounded), one equi-join on the
    * shifted day, one lags-sized aggregate. */
  def crossCorrelation(df: DataFrame, seriesCol: String,
      dayCol: String, xCol: String, seriesA: String, seriesB: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 365, s"bad maxLag: $maxLag")
    val base = df.select(col(seriesCol).as("__s"),
      col(dayCol).cast("long").as("__day"),
      col(xCol).cast("long").as("__x"))
    val a = base.filter(col("__s") === seriesA)
      .select(col("__day").as("__da"), col("__x").as("__xa"))
      .withColumn("lag",
        explode(array((-maxLag to maxLag).map(l => lit(l.toLong)): _*)))
    val b = base.filter(col("__s") === seriesB)
      .select(col("__day").as("__db"), col("__x").as("__xb"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = a.join(b, col("__db") === col("__da") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum("__xa").as("sa"), sum("__xb").as("sb"),
        sum(dec(col("__xa")) * dec(col("__xa"))).as("saa"),
        sum(dec(col("__xb")) * dec(col("__xb"))).as("sbb"),
        sum(dec(col("__xa")) * dec(col("__xb"))).as("sab"))
    val n = col("n").cast("double")
    val va = n * col("saa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double")
    val vb = n * col("sbb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double")
    val corr = (n * col("sab").cast("double") -
      col("sa").cast("double") * col("sb").cast("double")) /
      sqrt(va * vb)
    val scored = m.select(col("lag"), col("n"),
      round(when(col("n") >= 2 && va > 0 && vb > 0, corr), 6)
        .as("corr"))
    val best = Window.orderBy(col("corr").desc_nulls_last,
      col("lag").asc)
    // the rank window runs over the (2*maxLag+1)-row frame only; an
    // all-null corr column (nothing scorable) flags NO best lag
    scored
      .withColumn("is_best",
        row_number().over(best) === 1 && col("corr").isNotNull)
      .orderBy("lag")
  }

  /** Feature gain scan — [[mutualInformation]] run over a list of
    * candidate categorical features against one target, labeled and
    * stacked: the "which column actually predicts the label"
    * leakage/redundancy sweep run before any model is trained. Each
    * feature costs one cell-frame aggregate; the features list is
    * bounded (it is a column list, not data). */
  def featureGainScan(df: DataFrame, features: Seq[(String, Column)],
      targetCol: String): DataFrame = {
    require(features.nonEmpty, "no features")
    features.map { case (name, c) =>
      mutualInformation(df.select(c.as("__feat"), col(targetCol)),
        "__feat", targetCol)
        .select(lit(name).as("feature"), col("n"), col("h_x"),
          col("h_y"), col("h_xy"), col("mi"), col("nmi"))
    }.reduce(_.unionByName(_)).orderBy("feature")
  }

  /** Weight-of-evidence / information-value scoring of a categorical
    * feature against a boolean target — the credit-scoring feature
    * ranking ("how separative is this feature?") that doubles as a
    * label-leakage detector in curation pipelines. Per category:
    * `woe = ln(good_k/good_tot) − ln(bad_k/bad_tot)` in log-ratio form
    * (`ln good_k + ln bad_tot − ln bad_k − ln good_tot`, no count
    * products to overflow) and its IV contribution
    * `(good_k/gt − bad_k/bt)·woe`; sum iv_contrib for the feature's
    * IV. One-sided categories (zero goods or zero bads) have
    * undefined WoE: emitted with null woe/iv_contrib rather than an
    * arbitrary smoothing constant.
    *
    * Scale shape: one hash aggregate to the category frame, totals
    * broadcast back; everything after is categories-sized. */
  def weightOfEvidence(df: DataFrame, featureCol: String,
      targetCol: String): DataFrame = {
    val cells = df
      .filter(col(featureCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(featureCol).cast("string").as("__f"))
      .agg(sum(when(col(targetCol), 1L).otherwise(0L)).as("good"),
        sum(when(col(targetCol), 0L).otherwise(1L)).as("bad"))
    val tot = cells.agg(sum("good").as("gt"), sum("bad").as("bt"))
    val woe = log(col("good").cast("double")) +
      log(col("bt").cast("double")) -
      log(col("bad").cast("double")) - log(col("gt").cast("double"))
    val defined = col("good") > 0 && col("bad") > 0
    cells.crossJoin(broadcast(tot))
      .select(col("__f").as(featureCol), col("good"), col("bad"),
        round(col("good") / col("gt").cast("double"), 6).as("pct_good"),
        round(col("bad") / col("bt").cast("double"), 6).as("pct_bad"),
        round(when(defined, woe), 6).as("woe"),
        round(when(defined,
          (col("good") / col("gt").cast("double") -
            col("bad") / col("bt").cast("double")) * woe), 6)
          .as("iv_contrib"))
      .orderBy(featureCol)
  }

  /** Additive day-of-week seasonal decomposition of a daily series —
    * trend (centered 7-day moving average), seasonal (the dow profile
    * of the detrended series), remainder. The volume-dashboard
    * decomposition that separates "weekends are slow" from "we are
    * actually trending down".
    *
    * Exactness: with integral `x`, the detrended series is kept as
    * the INTEGER `7·x − Σ₇x` (exact in any order), so the dow means
    * are integral-numerator ratios and trend/seasonal/remainder are
    * each a single float expression — engine-exact at 6dp. Edge rows
    * (incomplete 7-day window) keep null trend/remainder, the
    * standard MA convention. Day-of-week is the family-shared
    * [[Temporal.dowOf]] (0=Monday); the label is internal grouping
    * only (dropped from the output), so the convention choice cannot
    * change results — only joinability of intermediate frames.
    *
    * Assumes consecutive daily rows per group (the window is ROWS,
    * not days) — gap-fill upstream ([[Temporal.gapFillLocf]]) first
    * if the series has holes. Scale shape: one group-key shuffle for
    * the MA window; the dow profile is a (groups×7)-sized broadcast
    * join back. */
  def seasonalDow(df: DataFrame, groupCol: String, dayCol: String,
      xCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
      col(dayCol).cast("long").as("__day"),
      col(xCol).cast("long").as("__x"))
    val w7 = Window.partitionBy("__g").orderBy("__day")
      .rowsBetween(-3, 3)
    val t = base
      .withColumn("__s7", sum("__x").over(w7))
      .withColumn("__c7", count(lit(1)).over(w7))
      .withColumn("__detr7",
        when(col("__c7") === 7, col("__x") * 7 - col("__s7")))
      .withColumn("__dow", Temporal.dowOf(col("__day")))
    val prof = t.filter(col("__detr7").isNotNull)
      .groupBy("__g", "__dow")
      .agg(sum("__detr7").as("__sd"), count(lit(1)).as("__cd"))
    t.join(broadcast(prof), Seq("__g", "__dow"), "left")
      .select(col("__g").as(groupCol), col("__day").as(dayCol),
        col("__x").as(xCol),
        round(when(col("__c7") === 7, col("__s7") / 7.0), 6)
          .as("trend"),
        round(col("__sd") / (col("__cd") * 7.0), 6).as("seasonal"),
        round(col("__detr7") / 7.0 -
          col("__sd") / (col("__cd") * 7.0), 6).as("remainder"))
      .orderBy(groupCol, dayCol)
  }

  /** Rolling (Bollinger) bands over a daily series — trailing-window
    * mean ± k·sd with a breach flag, the volatility-aware alerting
    * sibling of [[ewmaSmooth]]. The first `window−1` rows of each
    * group keep null bands (incomplete window, the MA convention).
    *
    * Exactness: the window accumulates the INTEGRAL sums `Σx` and
    * `Σx²` (each x² factor cast to decimal(19,0) so the product
    * promotes to decimal(38,0), as in concentrationIndex — a
    * corpus-scale daily count squared overflows BIGINT; cast the
    * FACTORS, not the product, or the multiply itself overflows),
    * so mean and the sample sd are each one float
    * expression over exact integers; breach compares the UNROUNDED
    * bounds, identically evaluated on both engines. Scale shape: one
    * group-key shuffle, rows-bounded frames, no joins. */
  def rollingBands(df: DataFrame, groupCol: String, dayCol: String,
      xCol: String, window: Int = 7, k: Double = 2.0): DataFrame = {
    require(window >= 2 && window <= 3650, s"bad window: $window")
    require(k > 0, s"bad k: $k")
    val w = Window.partitionBy("__g").orderBy("__day")
      .rowsBetween(-(window - 1), 0)
    val base = df.select(col(groupCol).as("__g"),
      col(dayCol).cast("long").as("__day"),
      col(xCol).cast("long").as("__x"))
    val s1 = sum("__x").over(w).cast("double")
    val s2 = sum(col("__x").cast("decimal(19,0)") *
      col("__x").cast("decimal(19,0)")).over(w).cast("double")
    val full = count(lit(1)).over(w) === window
    val mean = s1 / window
    val sd = sqrt((lit(window.toDouble) * s2 - s1 * s1) /
      (lit(window.toDouble) * (window - 1.0)))
    base
      .withColumn("__mean", when(full, mean))
      .withColumn("__sd", when(full, sd))
      .withColumn("breach", coalesce(
        col("__x") > col("__mean") + lit(k) * col("__sd") ||
          col("__x") < col("__mean") - lit(k) * col("__sd"),
        lit(false)))
      .select(col("__g").as(groupCol), col("__day").as(dayCol),
        col("__x").as(xCol), round(col("__mean"), 6).as("mean"),
        round(col("__sd"), 6).as("sd"),
        round(col("__mean") + lit(k) * col("__sd"), 6).as("upper"),
        round(col("__mean") - lit(k) * col("__sd"), 6).as("lower"),
        col("breach"))
      .orderBy(groupCol, dayCol)
  }

  /** Two-proportion z-test — the A/B conversion readout: arm A vs
    * arm B conversion rates, pooled-variance z statistic, and the
    * 5%-level flag. All inputs are integral counts from ONE corpus
    * aggregate; every ratio is a single float expression, so the test
    * is oracle-exact at 6dp. Degenerate pools (all converted / none /
    * an empty arm) yield null z and a false flag, never a NaN. */
  def proportionZTest(df: DataFrame, armCol: String,
      outcomeCol: String): DataFrame = {
    val a = col(armCol)
    val o = col(outcomeCol)
    val agg = df.filter(a.isNotNull && o.isNotNull).agg(
      sum(when(a, 1L).otherwise(0L)).as("n_a"),
      sum(when(a && o, 1L).otherwise(0L)).as("conv_a"),
      sum(when(!a, 1L).otherwise(0L)).as("n_b"),
      sum(when(!a && o, 1L).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a") / col("n_a").cast("double")
    val pb = col("conv_b") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")) /
      (col("n_a") + col("n_b")).cast("double")
    val ok = col("n_a") > 0 && col("n_b") > 0
    val z = (pa - pb) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(when(ok, pa), 6).as("p_a"),
      round(when(ok, pb), 6).as("p_b"),
      round(when(ok && pp > 0 && pp < 1, z), 6).as("z"),
      coalesce(when(ok && pp > 0 && pp < 1,
        abs(z) > 1.959964), lit(false)).as("significant"))
  }

  /** Exact Pearson correlation matrix over DECLARED-SCALE numeric
    * columns — the feature-audit pass before any modeling on tabular
    * data. The caller declares an integer scale per column (a
    * 2-decimal money column scales by 100); each value is rounded to
    * that grid and all five sufficient statistics (n, Σx, Σx², Σxy)
    * accumulate in decimal(38,0)-exact integer space (factors cast to
    * decimal(19,0), products promoted — the concentrationIndex
    * recipe), so `r = (nΣxy − ΣxΣy)/√(nΣx²−(Σx)²)√(nΣy²−(Σy)²)` is a
    * handful of exact divisions, bit-identical on any engine. Rows
    * with ANY null among the declared columns are dropped (complete
    * cases — the contract that keeps every pair on the same n).
    * Output one row per unordered pair (declaration order):
    * `(col_x, col_y, n, r)`; zero-variance columns yield null r.
    * ONE corpus aggregate; everything after is pairs-sized. */
  def pearsonMatrix(df: DataFrame, cols: Seq[(String, Long)])
      : DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"need 2-16 columns: ${cols.size}")
    require(cols.forall(_._2 >= 1), "scales must be >= 1")
    val names = cols.map(_._1)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val nonNull = names.map(c => col(c).isNotNull).reduce(_ && _)
    val scaled = cols.map { case (c, s) =>
      round(col(c) * s, 0).cast("decimal(19,0)").as(s"__$c") }
    val base = df.filter(nonNull).select(scaled: _*)
    val aggs =
      names.map(c => sum(col(s"__$c").cast("decimal(38,0)"))
        .as(s"__s_$c")) ++
      names.map(c => sum(col(s"__$c") * col(s"__$c")).as(s"__q_$c")) ++
      pairs.map { case (a, b) =>
        sum(col(s"__$a") * col(s"__$b")).as(s"__p_${a}_$b") }
    val row = base.agg(count(lit(1)).as("__n"), aggs: _*)
    val n = col("__n").cast("decimal(20,0)")
    def dvar(c: String) =
      (n * col(s"__q_$c") - col(s"__s_$c") * col(s"__s_$c"))
        .cast("double")
    val pairStructs = pairs.map { case (a, b) =>
      val num = (n * col(s"__p_${a}_$b") -
        col(s"__s_$a") * col(s"__s_$b")).cast("double")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col("__n").as("n"),
        round(when(dvar(a) > 0 && dvar(b) > 0,
          num / (sqrt(dvar(a)) * sqrt(dvar(b)))), 6).as("r"))
    }
    row.select(explode(array(pairStructs: _*)).as("p")).select("p.*")
  }

  /** Welch's unequal-variance t-test on a DECLARED-SCALE metric
    * between exactly two groups — the default A/B readout on means
    * (money metrics are 2-decimal: scale 100). Sufficient statistics
    * (n, Σv, Σv²) accumulate in decimal(38,0) integer space per
    * group; the sample variance is the exact-rational form
    * `(nΣv² − (Σv)²)/(n(n−1))` and the t statistic and
    * Welch–Satterthwaite df are a fixed-order double chain off those
    * integers — oracle-exact. Groups are lexicographically ordered;
    * refuses anything but exactly 2 (the [[Survival.logRank]]
    * contract). Output one row: `(group_a, group_b, n_a, n_b,
    * mean_a, mean_b, t, df)` with means in NATURAL units. */
  def welchTTest(df: DataFrame, valueCol: String, scale: Long,
      groupCol: String): DataFrame = {
    require(scale >= 1, s"bad scale: $scale")
    val base = TrackedCaches.persist(df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(round(col(valueCol) * scale, 0).cast("decimal(19,0)")
        .as("__v"), col(groupCol).cast("string").as("__g")))
    val groups = base.select("__g").distinct().limit(3).collect()
      .map(_.getString(0)).sorted
    require(groups.length == 2,
      s"welchTTest needs exactly 2 groups; saw ${groups.length} " +
        s"(${groups.mkString(", ")}${if (groups.length == 3) ", ..." else ""})")
    val Array(ga, gb) = groups
    def side(g: String, sfx: String) = base.filter(col("__g") === g)
      .agg(count(lit(1)).as(s"n_$sfx"),
        sum(col("__v").cast("decimal(38,0)")).as(s"__s$sfx"),
        sum(col("__v") * col("__v")).as(s"__q$sfx"))
    val agg = side(ga, "a").crossJoin(broadcast(side(gb, "b")))
    def nd(c: String) = col(c).cast("decimal(20,0)")
    def vhat(sfx: String) =
      (nd(s"n_$sfx") * col(s"__q$sfx") -
        col(s"__s$sfx") * col(s"__s$sfx")).cast("double") /
        (col(s"n_$sfx") * (col(s"n_$sfx") - 1)).cast("double")
    def mean(sfx: String) =
      col(s"__s$sfx").cast("double") /
        (col(s"n_$sfx") * scale).cast("double")
    val se2a = vhat("a") / col("n_a").cast("double")
    val se2b = vhat("b") / col("n_b").cast("double")
    // t and df are in SCALED units for the variance terms; t is
    // scale-invariant (numerator and denominator both carry 1/scale)
    val tStat = (col("__sa").cast("double") / col("n_a").cast("double")
      - col("__sb").cast("double") / col("n_b").cast("double")) /
      sqrt(se2a + se2b)
    val dfW = (se2a + se2b) * (se2a + se2b) /
      (se2a * se2a / (col("n_a") - 1).cast("double") +
        se2b * se2b / (col("n_b") - 1).cast("double"))
    val ok = col("n_a") > 1 && col("n_b") > 1
    agg.select(lit(ga).as("group_a"), lit(gb).as("group_b"),
      col("n_a"), col("n_b"),
      round(mean("a"), 6).as("mean_a"),
      round(mean("b"), 6).as("mean_b"),
      round(when(ok && se2a + se2b > 0, tStat), 6).as("t"),
      round(when(ok && se2a + se2b > 0, dfW), 4).as("df"))
  }

  /** Hill tail-index estimator over the top `k` order statistics —
    * "how heavy is this distribution's tail" (doc lengths, order
    * values, degree distributions): `hill = (1/k)·Σ_{i≤k}
    * ln(x_(i)/x_(k+1))`, `alpha = 1/hill` (smaller alpha = heavier
    * tail; alpha ≤ 2 means infinite variance). The top k+1 rows ride
    * a TakeOrdered (never a global sort); boundary ties are value-
    * ties, so both engines see the same value multiset. The log sum
    * is a sorted fold over k+1 doubles (x_(k+1)'s own term is
    * ln(1)=0, so folding all k+1 equals the standard k-term sum).
    * Output one row: `(k, x_kplus1, hill, tail_alpha)`. */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int)
      : DataFrame = {
    require(k >= 10 && k <= 100000, s"bad k: $k")
    val top = df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(valueCol).cast("double").as("__v"))
      .orderBy(col("__v").desc).limit(k + 1)
    val agg = top.agg(count(lit(1)).as("__m"), min("__v").as("__xk"),
      aggregate(sort_array(collect_list(log(col("__v")))), lit(0.0),
        (acc, x) => acc + x).as("__slog"))
    val hill = (col("__slog") - col("__m") * log(col("__xk"))) /
      lit(k.toDouble)
    agg.filter(col("__m") === k + 1) // fewer rows: estimator undefined
      .select(lit(k).cast("long").as("k"),
        round(col("__xk"), 6).as("x_kplus1"),
        round(hill, 6).as("hill"),
        round(when(hill > 0, lit(1.0) / hill), 6).as("tail_alpha"))
  }

  /** CUPED variance-reduction adjustment (Deng et al. 2013) — adjust
    * each arm's post-period mean by its pre-period imbalance:
    * `θ = cov(pre, post)/var(pre)` pooled over all units, per arm
    * `mean_adj = mean(post) − θ·(mean(pre) − mean(pre_all))`. All
    * sufficient statistics accumulate in decimal(38,0) integer space
    * at the declared scale; θ and the adjusted means are fixed-order
    * double chains — oracle-exact. Output one row per group:
    * `(group, n, mean_post, mean_pre, theta, mean_adj)` in natural
    * units. One pass for the pooled stats + one grouped aggregate. */
  def cupedAdjust(df: DataFrame, preCol: String, postCol: String,
      scale: Long, groupCol: String): DataFrame = {
    require(scale >= 1, s"bad scale: $scale")
    val base = TrackedCaches.persist(df
      .filter(col(preCol).isNotNull && col(postCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(round(col(preCol) * scale, 0).cast("decimal(19,0)")
          .as("__x"),
        round(col(postCol) * scale, 0).cast("decimal(19,0)").as("__y"),
        col(groupCol).cast("string").as("__g")))
    val pooled = base.agg(count(lit(1)).as("__nn"),
      sum(col("__x").cast("decimal(38,0)")).as("__sx"),
      sum(col("__y").cast("decimal(38,0)")).as("__sy"),
      sum(col("__x") * col("__x")).as("__qx"),
      sum(col("__x") * col("__y")).as("__pxy"))
    val nd = col("__nn").cast("decimal(20,0)")
    val theta = (nd * col("__pxy") - col("__sx") * col("__sy"))
      .cast("double") /
      (nd * col("__qx") - col("__sx") * col("__sx")).cast("double")
    val perG = base.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,0)")).as("__gx"),
        sum(col("__y").cast("decimal(38,0)")).as("__gy"))
    perG.crossJoin(broadcast(pooled))
      .withColumn("__theta", theta)
      .withColumn("__mpre",
        col("__gx").cast("double") / (col("n") * scale).cast("double"))
      .withColumn("__mpost",
        col("__gy").cast("double") / (col("n") * scale).cast("double"))
      .withColumn("__mpreAll", col("__sx").cast("double") /
        (col("__nn") * scale).cast("double"))
      .select(col(groupCol), col("n"),
        round(col("__mpost"), 6).as("mean_post"),
        round(col("__mpre"), 6).as("mean_pre"),
        round(col("__theta"), 6).as("theta"),
        round(col("__mpost") - col("__theta") *
          (col("__mpre") - col("__mpreAll")), 6).as("mean_adj"))
  }

  /** Split-conformal prediction threshold per group — the
    * distribution-free calibration step behind selective prediction
    * and LLM-router confidence gating (Vovk et al.; Angelopoulos &
    * Bates 2023 tutorial): on the CALIBRATION split take the
    * `ceil((n_cal+1)*(1-alpha))`-th smallest nonconformity score as
    * the threshold, then report empirical coverage (`score <=
    * threshold`) on the TEST split, which is guaranteed `>= 1-alpha`
    * in expectation under exchangeability.
    *
    * The order statistic is picked by `row_number` over
    * `(score, id)` — the id tiebreak makes the pick deterministic
    * under duplicate scores. One window over the calibration split
    * (per-group, so skew is bounded by the largest group's
    * calibration slice) + one hash aggregate per split; counts
    * integral, coverage one guarded division. */
  def conformalSplit(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, splitCol: String, alpha: Double = 0.1)
      : DataFrame = {
    require(alpha > 0 && alpha < 1, s"bad alpha: $alpha")
    val cal = df.filter(col(splitCol) === "cal")
    val ranked = cal.withColumn("__rn", row_number().over(
      Window.partitionBy(groupCol).orderBy(col(scoreCol), col(idCol))))
    val calAgg = cal.groupBy(groupCol)
      .agg(count(lit(1)).as("n_cal"))
      .withColumn("__k",
        ceil((col("n_cal") + 1) * lit(1.0 - alpha)).cast("long"))
    // the +1 quantile index can exceed n_cal for tiny groups — the
    // standard convention is then "no finite threshold" (coverage
    // cannot be guaranteed); those groups drop from the output, the
    // caller's signal to collect more calibration data
    // the thresholds frame is consumed twice (coverage join + final
    // select); it is groups-sized but its lineage carries the FULL
    // calibration-split window — persist so the window runs once
    val thr = TrackedCaches.persist(
      calAgg.join(ranked.select(col(groupCol),
          col("__rn"), col(scoreCol).cast("double").as("__s")),
          Seq(groupCol), "left")
        .filter(col("__rn") === col("__k"))
        .select(col(groupCol), col("n_cal"), col("__k").as("k"),
          round(col("__s"), 6).as("threshold")))
    val covered = df.filter(col(splitCol) === "test")
      .join(thr, Seq(groupCol), "inner")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col(scoreCol).cast("double") <= col("threshold"), 1L)
          .otherwise(0L)).as("__cov"))
    thr.join(covered, Seq(groupCol), "left")
      .select(col(groupCol), col("n_cal"), col("k"), col("threshold"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        round(when(col("n_test") > 0,
          col("__cov").cast("double") / col("n_test"))
          .otherwise(lit(null)), 6).as("coverage"))
  }

  /** Sample-ratio-mismatch check — the first diagnostic every
    * experimentation platform runs before reading an A/B test
    * (Fabijan et al. 2019: SRM is the most common invalidator):
    * chi-square of observed arm counts against the DESIGNED
    * allocation `weights`. Output one row per arm (observed,
    * expected, contribution) plus the shared `chi2` and `df`
    * columns; compare chi2 to the critical value for k-1 df.
    *
    * One hash aggregate over the assignment log (integral counts);
    * expected counts and contributions are single-expression doubles
    * off those integers, and the chi2 total is a sum over the
    * ARM-sized frame (bounded by the weights list, not the data). */
  def srmCheck(df: DataFrame, armCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must cover all arms and sum to 1")
    val spark = df.sparkSession
    val w = spark.createDataFrame(weights).toDF("arm", "weight")
    val counts = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("observed"))
    // witness probe (the mixtureKl pattern): an observed arm missing
    // from the designed weights would silently drop from the output
    // while its rows still count in __n — every expected count, the
    // chi2, and the df would then be computed against an incomplete
    // design. The probe is one bounded job over the arms-sized frame.
    val missing = counts.join(broadcast(w), Seq("arm"), "left_anti")
      .limit(1).collect()
    require(missing.isEmpty,
      s"srmCheck: observed arm ${missing.headOption.map(_.get(0))} is " +
        "not in the designed weights — add it (its rows count in the " +
        "total, so every expected count would be wrong)")
    val joined = broadcast(w).join(counts, Seq("arm"), "left")
      .select(col("arm"), col("weight"),
        coalesce(col("observed"), lit(0L)).as("observed"))
      .crossJoin(broadcast(
        counts.agg(sum("observed").cast("long").as("__n"))))
      .withColumn("expected", col("__n") * col("weight"))
      .withColumn("contrib",
        (col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"))
    joined
      .withColumn("chi2", sum("contrib").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("arm"), col("observed"),
        round(col("expected"), 6).as("expected"),
        round(col("contrib"), 6).as("contrib"),
        round(col("chi2"), 6).as("chi2"),
        lit(weights.size - 1L).as("df"))
  }

  /** McNemar's test for PAIRED model comparison — the correct
    * significance test when two models answer the SAME examples
    * (Dietterich 1998): only the discordant cells carry signal.
    * Emits the discordant counts and the continuity-corrected
    * statistic `(|n01 - n10| - 1)^2 / (n01 + n10)` (1 df); all
    * counts integral from ONE corpus aggregate, the statistic a
    * single guarded expression. */
  def mcnemar(df: DataFrame, aOkCol: String, bOkCol: String)
      : DataFrame = {
    val a = col(aOkCol).cast("boolean")
    val b = col(bOkCol).cast("boolean")
    df.agg(count(lit(1)).as("n"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
        sum(when(a && b, 1L).otherwise(0L)).as("n11"))
      .withColumn("chi2",
        round(when(col("n10") + col("n01") > 0,
          (abs(col("n10") - col("n01")) - 1) *
            (abs(col("n10") - col("n01")) - 1) /
            (col("n10") + col("n01")).cast("double"))
          .otherwise(0.0), 6))
  }

  /** Benjamini-Hochberg FDR correction — the multiple-testing step
    * every eval suite with dozens of metric comparisons needs
    * (Benjamini & Hochberg 1995). Adjusted p for the k-th smallest
    * p-value is `min_{j >= k} p_(j) * m / j` (monotone step-down),
    * computed as a running MIN from the largest rank — min is
    * order-insensitive, so there is no cross-row float-sum hazard at
    * all. `significant` applies the `q` cutoff to the 6dp-rounded
    * adjusted p on both engines. The frame is tests-sized (bounded
    * by the eval suite, not the corpus), so the single unpartitioned
    * rank window is safe by construction. */
  def bhCorrect(df: DataFrame, testCol: String, pCol: String,
      q: Double = 0.05): DataFrame = {
    require(q > 0 && q < 1, s"bad q: $q")
    val ranked = df.select(col(testCol).as("test"),
        col(pCol).cast("double").as("p"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("p"), col("test"))))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    ranked
      .withColumn("adj_p", round(least(lit(1.0),
        min(col("p") * col("m") / col("rank")).over(
          Window.orderBy(col("rank").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))),
        6))
      .select(col("test"), round(col("p"), 6).as("p"), col("rank"),
        col("adj_p"))
      .withColumn("significant", col("adj_p") <= q)
  }

  /** Two-proportion sample-size (power) calculation — the "how long
    * must this A/B run" planner: per scenario row `(p1, p2)`, the
    * classical normal-approximation `n per arm =
    * ((z_a * sqrt(2 pbar qbar) + z_b * sqrt(p1 q1 + p2 q2)) / |d|)^2`
    * rounded UP. The z quantiles arrive as explicit doubles (defaults
    * are the two-sided 5% / 80%-power constants) so the arithmetic is
    * engine-replayable — a quantile FUNCTION is not ANSI, a quantile
    * CONSTANT is. Map-only over the scenarios frame. */
  def powerTwoProportions(df: DataFrame, p1Col: String, p2Col: String,
      zAlpha: Double = 1.959963984540054,
      zPower: Double = 0.8416212335729143): DataFrame = {
    val p1 = col(p1Col).cast("double")
    val p2 = col(p2Col).cast("double")
    val pbar = (p1 + p2) / 2.0
    val num = lit(zAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(zPower) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    val d = abs(p1 - p2)
    df.select(col(p1Col), col(p2Col))
      .withColumn("n_per_arm",
        when(d > 0, ceil((num / d) * (num / d)).cast("long")))
  }

  /** SPRT (sequential probability ratio test) decision replay — the
    * always-valid early-stopping monitor (Wald 1945): per experiment,
    * walk the observations in sequence order accumulating the
    * log-likelihood ratio for `p1` vs `p0` Bernoulli outcomes, and
    * stop at the first crossing of `ln((1-beta)/alpha)` (accept p1)
    * or `ln(beta/(1-alpha))` (accept p0). The two per-observation LLR
    * increments are caller-visible DOUBLES (computed once on the
    * driver) and the cumulative sum is a window in sequence order —
    * both engines add the identical values in the identical order,
    * so the walk replays exactly.
    *
    * Output per experiment: decision (`accept_p1` / `accept_p0` /
    * `continue`), observations consumed at decision time, and the
    * final LLR. One window + one aggregate per experiment. */
  def sprtDecision(df: DataFrame, expCol: String, seqCol: String,
      successCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05,
      maxObsPerExperiment: Long = 10000000L): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"bad p0/p1: $p0/$p1")
    // the per-experiment cumsum is inherently sequential — one task
    // walks one experiment (the same skewed-key window class as the
    // r10 token-budget finding, but with NO rank pre-trim possible:
    // the crossing can happen anywhere). Enforce the bound instead
    // of silently funneling a 100 TB experiment through one task; a
    // monitor that has not decided within the cap should truncate
    // upstream (SPRT's expected sample size is tiny compared to it)
    val over = df.groupBy(expCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxObsPerExperiment).limit(1).collect()
    require(over.isEmpty,
      s"sprtDecision: experiment ${over.headOption.map(_.get(0))} " +
        s"exceeds maxObsPerExperiment=$maxObsPerExperiment — the " +
        "per-experiment walk is single-task; truncate or shard the " +
        "monitor window upstream")
    // determinism guard: the walk is ordered by seqCol ALONE, so a
    // duplicate sequence value inside an experiment would make
    // row_number, the cumulative LLR path, and hence decision /
    // n_at_decision (and max_by's llr_final) nondeterministic across
    // engines and partitionings. Require uniqueness outright — a
    // sequential test with ambiguous observation order is ill-posed,
    // and the probe is one bounded aggregate.
    val dup = df.groupBy(col(expCol), col(seqCol))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"sprtDecision: duplicate $seqCol=${dup.headOption.map(_.get(1))} " +
        s"in experiment ${dup.headOption.map(_.get(0))} — the walk " +
        "order (and the decision) would be nondeterministic; " +
        "disambiguate the sequence column upstream")
    val up = math.log((1.0 - beta) / alpha)
    val lo = math.log(beta / (1.0 - alpha))
    val incS = math.log(p1 / p0)
    val incF = math.log((1.0 - p1) / (1.0 - p0))
    val w = Window.partitionBy(expCol).orderBy(col(seqCol))
    val walked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__llr", sum(
        when(col(successCol).cast("boolean"), lit(incS))
          .otherwise(lit(incF))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__cross",
        when(col("__llr") >= up, "accept_p1")
          .when(col("__llr") <= lo, "accept_p0"))
    walked.groupBy(col(expCol).as("experiment"))
      .agg(count(lit(1)).as("n_obs"),
        // struct-min skips null entries, so the min is the FIRST
        // crossing (by observation index) with its decision attached
        min(when(col("__cross").isNotNull,
          struct(col("__rn").cast("long").as("s"),
            col("__cross").as("d")))).as("__fc"),
        round(max_by(col("__llr"), col(seqCol)), 6).as("llr_final"))
      .select(col("experiment"), col("n_obs"),
        coalesce(col("__fc").getField("d"), lit("continue"))
          .as("decision"),
        coalesce(col("__fc").getField("s"), col("n_obs"))
          .as("n_at_decision"),
        col("llr_final"))
  }

  /** Cohen's kappa — chance-corrected agreement of TWO raters over
    * the same items (Cohen 1960), the first QA statistic on any
    * human-labeled preference/safety dataset: `kappa =
    * (po - pe) / (1 - pe)` with `po` the raw agreement rate and `pe`
    * the marginal-product chance rate.
    *
    * One corpus pass to the (a, b) contingency cells (category^2-
    * bounded); margins come off that frame. Every sum is integral
    * (DECIMAL products, exact at any corpus size), so po/pe/kappa are
    * single divisions off exact integers — oracle-exact. Perfect
    * chanceless agreement (pe = 1, a single shared category) has no
    * defined kappa: null. */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String)
      : DataFrame = {
    val cells = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    val ra = cells.groupBy("__a")
      .agg(sum("__c").cast("decimal(38,0)").as("__ra"))
    val rb = cells.groupBy(col("__b").as("__a"))
      .agg(sum("__c").cast("decimal(38,0)").as("__rb"))
    val peNum = ra.join(rb, Seq("__a"))
      .agg(coalesce(sum(col("__ra") * col("__rb")),
        lit(0).cast("decimal(38,0)")).as("__pe_num"))
    cells.agg(sum("__c").as("n"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
          .as("__agree"))
      .crossJoin(broadcast(peNum))
      .select(col("n"),
        round(col("__agree").cast("double") / col("n"), 6).as("po"),
        round(col("__pe_num").cast("double") /
          (col("n").cast("double") * col("n")), 6).as("pe"))
      .withColumn("kappa",
        round(when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))), 6))
  }

  /** Fleiss' kappa — chance-corrected agreement of a FIXED panel of
    * `n` raters over many items (Fleiss 1971), from the long
    * `(item, category)` ratings frame. Requires every item to carry
    * exactly the same rating count (witness-probed — unequal panels
    * make the statistic ill-defined).
    *
    * All moments are integral: `S2 = sum n_ij^2` and the per-category
    * column-sum squares accumulate in DECIMAL, so P-bar and Pe are
    * exact-integer ratios — oracle-exact. */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String)
      : DataFrame = {
    val d = df.filter(col(itemCol).isNotNull && col(catCol).isNotNull)
      .select(col(itemCol).as("__i"), col(catCol).cast("string").as("__k"))
    val perItem = d.groupBy("__i").agg(count(lit(1)).as("__n"))
    val panel = perItem.agg(min("__n").as("__lo"), max("__n").as("__hi"),
      count(lit(1)).as("__items")).head()
    val (lo, hi, items) =
      (panel.getLong(0), panel.getLong(1), panel.getLong(2))
    require(lo == hi,
      s"fleissKappa: unequal rating counts per item ($lo..$hi) — the " +
        "statistic requires a fixed rater panel; filter or complete " +
        "the ratings upstream")
    require(lo >= 2, s"fleissKappa: need >= 2 ratings per item, got $lo")
    val nij = d.groupBy("__i", "__k").agg(count(lit(1)).as("__c"))
    val s2 = nij.agg(sum((col("__c") * col("__c"))
      .cast("decimal(38,0)")).as("__s2"))
    val colSq = nij.groupBy("__k")
      .agg(sum("__c").cast("decimal(38,0)").as("__cs"))
      .agg(sum(col("__cs") * col("__cs")).as("__csq"))
    val nN = lo.toDouble * items
    s2.crossJoin(broadcast(colSq))
      .select(lit(items).as("n_items"), lit(lo).as("n_raters"),
        round((col("__s2").cast("double") - nN) /
          (nN * (lo - 1)), 6).as("p_bar"),
        round(col("__csq").cast("double") / (nN * nN), 6).as("p_e"))
      .withColumn("kappa",
        round(when(col("p_e") < 1.0,
          (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e"))), 6))
  }

  /** Log-log least-squares fit per config — the scaling-law readout
    * (Kaplan et al. 2020; Hoffmann et al. 2022): slope, intercept,
    * and r^2 of `ln y ~ ln x` over each config's (compute, loss)
    * points. Rows with non-positive x or y drop (no defined log).
    * The covar_pop/var_pop moment pairing is the proven zipfSlope
    * oracle contract; r^2 guards zero variance on either axis. */
  def scalingLawFit(df: DataFrame, cfgCol: String, xCol: String,
      yCol: String): DataFrame =
    df.filter(col(xCol).cast("double") > 0 &&
        col(yCol).cast("double") > 0)
      .select(col(cfgCol).as("config"),
        log(col(xCol).cast("double")).as("__x"),
        log(col(yCol).cast("double")).as("__y"))
      .groupBy("config")
      .agg(count(lit(1)).as("n_points"),
        round(when(var_pop(col("__x")) =!= 0.0,
          covar_pop(col("__x"), col("__y")) / var_pop(col("__x"))), 6)
          .as("slope"),
        round(when(var_pop(col("__x")) =!= 0.0,
          avg(col("__y")) -
            covar_pop(col("__x"), col("__y")) / var_pop(col("__x")) *
              avg(col("__x"))), 6).as("intercept"),
        round(when(var_pop(col("__x")) =!= 0.0 &&
            var_pop(col("__y")) =!= 0.0,
          covar_pop(col("__x"), col("__y")) *
            covar_pop(col("__x"), col("__y")) /
            (var_pop(col("__x")) * var_pop(col("__y")))), 6).as("r2"))

  /** Population stability index between a reference and a current
    * split — the standard between-run drift monitor on any scored or
    * measured feature (PSI < 0.1 stable, > 0.25 shifted): integral
    * raw values bucket exactly like [[graft.operators.Eval
    * .calibrationBins]] (two-sided clamp, `bins` equal-width buckets
    * over [0, maxRaw]), shares are LAPLACE-SMOOTHED `(n_b + 1) /
    * (N + bins)` so empty buckets contribute finitely and
    * deterministically (no epsilon convention to fork on), and the
    * <= bins PSI terms fold in bin order. One hash aggregate over the
    * data + a bins-sized spine — oracle-exact. */
  def psi(df: DataFrame, splitCol: String, rawCol: String,
      maxRaw: Long, bins: Int = 10, refLabel: String = "ref",
      curLabel: String = "cur"): DataFrame = {
    require(maxRaw >= 1 && bins >= 2 && bins <= 1000,
      s"bad maxRaw=$maxRaw bins=$bins")
    val spark = df.sparkSession
    val capped = greatest(least(col(rawCol).cast("long"),
      lit(maxRaw)), lit(0L))
    val bin = least(floor(capped * bins / lit(maxRaw.toDouble)),
      lit((bins - 1).toLong)).cast("long")
    val counts = df
      .filter(col(rawCol).isNotNull &&
        col(splitCol).isin(refLabel, curLabel))
      .groupBy(bin.as("bin"))
      .agg(sum(when(col(splitCol) === refLabel, 1L).otherwise(0L))
          .as("__nr"),
        sum(when(col(splitCol) === curLabel, 1L).otherwise(0L))
          .as("__nc"))
    val spine = spark.range(bins).select(col("id").as("bin"))
    val filled = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__nr"), lit(0L)).as("__nr"),
        coalesce(col("__nc"), lit(0L)).as("__nc"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val pr = (col("__nr") + 1).cast("double") /
      (sum("__nr").over(tot) + bins)
    val pc = (col("__nc") + 1).cast("double") /
      (sum("__nc").over(tot) + bins)
    filled
      .withColumn("__term", (pc - pr) * log(pc / pr))
      .agg(sum("__nr").as("n_ref"), sum("__nc").as("n_cur"),
        round(aggregate(sort_array(collect_list(
          struct(col("bin"), col("__term").as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")), 6).as("psi"))
  }

  /** Two-sample Kolmogorov-Smirnov test — the nonparametric "did this
    * metric's DISTRIBUTION move" check (the mean-based monitors above
    * miss shape changes): D = max over values of |ECDF_a - ECDF_b|,
    * plus the asymptotic p-value `2 exp(-2 lambda^2)`,
    * `lambda = D sqrt(na nb / (na + nb))` (clamped to 1).
    *
    * The ECDFs are exact integer ratios accumulated over the
    * VALUE-ordered distinct-value frame; `d_at` reports the smallest
    * value attaining D (deterministic tiebreak). The one global
    * window runs over the distinct-value frame, not the corpus —
    * bounded by value cardinality (the global-order class, documented
    * like weightedMedian). */
  def ksTest2(df: DataFrame, splitCol: String, valueCol: String,
      aLabel: String, bLabel: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull &&
        col(splitCol).isin(aLabel, bLabel))
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(splitCol) === aLabel, 1L).otherwise(0L))
          .as("__ca"),
        sum(when(col(splitCol) === bLabel, 1L).otherwise(0L))
          .as("__cb"))
    val byV = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ecdf = counts
      .withColumn("__na", sum("__ca").over(tot))
      .withColumn("__nb", sum("__cb").over(tot))
      .withColumn("__gap", abs(
        sum("__ca").over(byV).cast("double") / col("__na") -
          sum("__cb").over(byV).cast("double") / col("__nb")))
    ecdf.withColumn("__dmax", max("__gap").over(tot))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        round(max("__gap"), 6).as("d_stat"),
        min(when(round(col("__gap"), 6) ===
          round(col("__dmax"), 6), col("v"))).as("d_at"))
      .withColumn("p_approx", round(least(lit(1.0),
        lit(2.0) * exp(lit(-2.0) * col("d_stat") * col("d_stat") *
          (col("n_a") * col("n_b")).cast("double") /
          (col("n_a") + col("n_b")))), 6))
  }

  /** Concentration report over group weights — "how much of the
    * corpus is one domain": HHI (sum of squared shares), the Gini
    * coefficient, and top-1/top-10 shares. The shape monitor behind
    * every per-domain cap decision ([[graft.operators.Urls]]).
    *
    * Every moment is integral: Gini rides `sum(rank * w)` over the
    * (weight asc, group asc) total order — invariant under tie
    * permutations, since tied weights contribute identically — and
    * HHI's squared sums stay in DECIMAL. The rank window runs over
    * the GROUPS frame (domains, not rows). Single-group input reads
    * gini 0, hhi 1. */
  def concentration(df: DataFrame, groupCol: String, wCol: String)
      : DataFrame = {
    val g = df.filter(col(wCol).cast("long") > 0)
      .groupBy(col(groupCol).as("__g"))
      .agg(sum(col(wCol).cast("long")).as("__w"))
    val asc = Window.orderBy(col("__w"), col("__g"))
    val desc = Window.orderBy(col("__w").desc, col("__g"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    g.withColumn("__i", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .agg(count(lit(1)).as("n_groups"),
        sum("__w").as("total_w"),
        sum((col("__w") * col("__w")).cast("decimal(38,0)"))
          .as("__sq"),
        sum((col("__i") * col("__w")).cast("decimal(38,0)"))
          .as("__iw"),
        sum(when(col("__rd") === 1, col("__w")).otherwise(0L))
          .as("__t1"),
        sum(when(col("__rd") <= 10, col("__w")).otherwise(0L))
          .as("__t10"))
      .select(col("n_groups"), col("total_w"),
        round(col("__sq").cast("double") /
          (col("total_w").cast("double") * col("total_w")), 6)
          .as("hhi"),
        round(when(col("n_groups") > 1,
          lit(2.0) * col("__iw").cast("double") /
            (col("n_groups") * col("total_w").cast("double")) -
            (col("n_groups") + 1).cast("double") / col("n_groups"))
          .otherwise(0.0), 6).as("gini"),
        round(col("__t1").cast("double") / col("total_w"), 6)
          .as("top1_share"),
        round(col("__t10").cast("double") / col("total_w"), 6)
          .as("top10_share"))
  }

  /** Benford first-digit expected shares, 6dp literals — inlined
    * identically into the oracle SQL so no engine ever computes a
    * logarithm for them. */
  val BenfordExpected: Seq[(Int, Double)] = Seq(
    1 -> 0.30103, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.09691,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** Benford's-law audit of a positive metric column — the synthetic-
    * data / fraud tripwire (fabricated or templated numbers flunk the
    * first-digit law). The value is fixed to INTEGER CENTS
    * (`round(v * 100)`), so the first digit comes off the decimal
    * string — no float log10 near power boundaries on either engine.
    * Output one row per digit (observed, share, expected, chi2
    * contribution) plus the shared chi2 (8 df) via the srmCheck
    * window pattern. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol).cast("double") * 100, 0)
      .cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val expected = BenfordExpected.foldLeft(lit(0.0)) {
      case (acc, (d, e)) => when(col("digit") === d, e).otherwise(acc)
    }
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    df.filter(cents > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("__n", sum("n_obs").over(tot))
      .withColumn("share",
        round(col("n_obs").cast("double") / col("__n"), 6))
      .withColumn("expected", expected)
      .withColumn("contrib", round(
        (col("n_obs") - col("__n") * col("expected")) *
          (col("n_obs") - col("__n") * col("expected")) /
          (col("__n") * col("expected")), 6))
      .withColumn("chi2", round(sum("contrib").over(tot), 6))
      .select("digit", "n_obs", "share", "expected", "contrib", "chi2")
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) — the two-sample LOCATION
    * test completing the drift family ([[ksTest2]] tests shape, this
    * tests "did the median move", robust to outliers where a t-test
    * is not): U = sum of sample-A pooled fractional ranks minus
    * nA(nA+1)/2, with the tie-corrected normal approximation.
    *
    * Scale shape: the rank-sum NEVER ranks rows. Every row sharing a
    * value v gets the same fractional rank cumBefore_v + (t_v+1)/2
    * (cumBefore = pooled count strictly below v, t = tie size), so
    * sample A's rank-sum collapses to the VALUE-level identity
    * `sum_v ca_v * (cumBefore_v + (t_v+1)/2)` over the grouped counts
    * frame — the same bounded-global-order class as [[ksTest2]] and
    * [[wasserstein1]] (one window over distinct values, map-side
    * combined counts feeding it), not a single-reducer sort of the
    * corpus. Exactness: each grouped term is integer x half-integer =
    * half-integer, and any sum of half-integers below 2^52 is exact
    * in IEEE doubles REGARDLESS of accumulation order — bit-identical
    * to the row-level rank-sum the oracle computes; the tie
    * correction `sum(t^3 - t)` is integral. */
  def mannWhitney(df: DataFrame, splitCol: String, valueCol: String,
      aLabel: String, bLabel: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull &&
        col(splitCol).isin(aLabel, bLabel))
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(sum(when(col(splitCol) === aLabel, 1L).otherwise(0L))
          .as("__ca"),
        count(lit(1)).as("__t"))
    val cumBefore = coalesce(sum(col("__t")).over(Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val agg = counts
      .withColumn("__below", cumBefore)
      .agg(sum("__ca").as("n_a"),
        sum(col("__t") - col("__ca")).as("n_b"),
        sum(col("__ca").cast("double") *
          (col("__below").cast("double") +
            (col("__t").cast("double") + 1.0) / 2.0)).as("__ra"),
        coalesce(sum(col("__t") * col("__t") * col("__t") -
          col("__t")), lit(0L)).as("__tc"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val u = col("__ra") - na * (na + 1) / 2.0
    val mu = na * nb / 2.0
    val sig = sqrt(na * nb / 12.0 *
      ((n + 1) - col("__tc").cast("double") / (n * (n - 1))))
    // z only — compare to the usual critical values (+-1.96 at 5%);
    // a cross-engine erf approximation would add noise, not rigor
    agg.select(col("n_a"), col("n_b"),
      round(u, 6).as("u_stat"),
      round(when(sig > 0, (u - mu) / sig), 6).as("z"))
  }

  /** One-dimensional Wasserstein-1 (earth-mover) distance between two
    * samples — the drift MAGNITUDE in the metric's own units
    * ([[ksTest2]]'s D is unitless; "the length distribution moved by
    * 37 tokens" is the actionable readout): `W1 = integral of
    * |ECDF_a - ECDF_b|`, computed as the gap-weighted sum over the
    * sorted distinct-value frame. ECDFs are exact integer ratios;
    * the <= |values| terms fold in value order (sorted fold), so the
    * number replays exactly. Same bounded global-order class as
    * ksTest2. */
  def wasserstein1(df: DataFrame, splitCol: String, valueCol: String,
      aLabel: String, bLabel: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull &&
        col(splitCol).isin(aLabel, bLabel))
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(sum(when(col(splitCol) === aLabel, 1L).otherwise(0L))
          .as("__ca"),
        sum(when(col(splitCol) === bLabel, 1L).otherwise(0L))
          .as("__cb"))
    val byV = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    counts
      .withColumn("__na", sum("__ca").over(tot))
      .withColumn("__nb", sum("__cb").over(tot))
      .withColumn("__gap",
        lead(col("v"), 1).over(Window.orderBy("v")) - col("v"))
      .withColumn("__term", when(col("__gap").isNotNull,
        abs(sum("__ca").over(byV).cast("double") / col("__na") -
          sum("__cb").over(byV).cast("double") / col("__nb")) *
          col("__gap")).otherwise(0.0))
      .agg(max("__na").as("n_a"), max("__nb").as("n_b"),
        round(aggregate(sort_array(collect_list(
          struct(col("v"), col("__term").as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")), 6).as("w1"))
  }

  /** Generic multiplier-bootstrap standard error for a corpus MEAN —
    * the did/MBoot Rademacher machinery lifted to arbitrary metrics
    * ("mean doc quality 0.62 ± what?"): replicate b perturbs the mean
    * by `t_b = (1/n) sum_i s_ib (x_i - mean)` with md5-derived ±1
    * signs, and `se = sqrt(mean_b t_b^2)`.
    *
    * Scale shape: ONE wide aggregate computes all 2B sign sums in a
    * single corpus pass (map-side combined) — never a B-fold explode
    * (a 64x corpus shuffle at 100 TB). Exactness: each t_b numerator
    * is the all-integer `n*sum(s x) - sum(s)*sum(x)` in DECIMAL, so
    * replicate terms are exact; the B-term square sum folds in fixed
    * replicate order on the one-row frame. Signs replay in SQL as the
    * same md5 threshold — fully oracle-exact. */
  def bootstrapMeanSe(df: DataFrame, idCol: String, valCol: String,
      b: Int = 64): DataFrame = {
    require(b >= 8 && b <= 256, s"bad b: $b")
    val x = col(valCol).cast("long")
    def sign(j: Int): Column =
      when(substring(md5(concat(col(idCol).cast("string"), lit("-"),
        lit(j))), 1, 1) < "8", 1L).otherwise(-1L)
    val signAggs = (0 until b).flatMap { j =>
      Seq(sum(sign(j) * x).cast("decimal(38,0)").as(s"__sx$j"),
        sum(sign(j)).cast("decimal(38,0)").as(s"__s$j"))
    }
    val allAggs =
      Seq(sum(x).cast("decimal(38,0)").as("__sum")) ++ signAggs
    val base = df.filter(x.isNotNull)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        allAggs: _*)
    // t_b = (n*sx - s*sum) / n^2; the square-sum folds in j order on
    // the one-row frame (a plain left-to-right + chain — no
    // partition-order hazard exists at one row)
    val n2 = (col("__n") * col("__n")).cast("double")
    val sq = (0 until b).map { j =>
      val t = (col(s"__sx$j") * col("__n") -
        col(s"__s$j") * col("__sum")).cast("double") / n2
      t * t
    }.reduce(_ + _)
    base.select(col("__n").cast("long").as("n"),
      round(col("__sum").cast("double") / col("__n").cast("double"), 6)
        .as("mean"),
      round(sqrt(sq / b), 6).as("se_boot"))
  }

  /** Robust outlier report per group via the median absolute
    * deviation — the robust-statistics sibling of z-scoring (one bad
    * heavy tail wrecks a mean/stddev rule; the MAD rule survives 50%
    * contamination). Flags `|x - median| > k * MAD`. Both medians are
    * `percentile_disc` DATA VALUES (the proven quantile_disc
    * cross-engine contract), so every comparison runs on identical
    * doubles in both engines. Two grouped quantile passes + one
    * counting aggregate; groups with MAD 0 (over half the mass on one
    * value) flag any deviation, the standard degenerate-MAD
    * convention. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"bad k: $k")
    val x = col(valCol).cast("double")
    val base = df.filter(x.isNotNull)
      .select(col(groupCol).as("__g"), x.as("__x"))
    val med = base.groupBy("__g")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __x)")
        .as("median"))
    val withAd = base.join(med, Seq("__g"))
      .withColumn("__ad", abs(col("__x") - col("median")))
    val mad = withAd.groupBy("__g")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __ad)")
        .as("mad"))
    withAd.join(mad, Seq("__g"))
      .groupBy(col("__g").as(groupCol), col("median"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col(groupCol), col("n"), round(col("median"), 6)
          .as("median"),
        round(col("mad"), 6).as("mad"), col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n"), 6)
          .as("outlier_rate"))
  }

  /** Seasonal MASE readout per stream — "is there period-`season`
    * structure": the MAE of the seasonal-naive forecast (lag season)
    * over the MAE of the naive forecast (lag 1); well under 1 means
    * the seasonal lag predicts better, i.e. real periodicity
    * (Hyndman & Koehler 2006's scaling denominator, used here as a
    * seasonality detector). The walk is (seq-ordered, uniqueness-
    * probed) and every error is INTEGER CENTS, so the MAEs are exact
    * integer ratios — oracle-exact with zero float accumulation. */
  def seasonalMase(df: DataFrame, streamCol: String, seqCol: String,
      valCol: String, season: Int = 5): DataFrame = {
    require(season >= 2 && season <= 10000, s"bad season: $season")
    val dup = df.groupBy(col(streamCol), col(seqCol))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"seasonalMase: duplicate $seqCol=${dup.headOption.map(_.get(1))} " +
        s"in stream ${dup.headOption.map(_.get(0))} — walk order " +
        "would be nondeterministic")
    val w = Window.partitionBy(streamCol).orderBy(col(seqCol))
    val walked = df
      .withColumn("__c",
        round(col(valCol).cast("double") * 100, 0).cast("long"))
      .withColumn("__e1", abs(col("__c") - lag("__c", 1).over(w)))
      .withColumn("__em", abs(col("__c") - lag("__c", season).over(w)))
    walked.groupBy(col(streamCol).as("stream"))
      .agg(count(lit(1)).as("n_obs"),
        count(col("__e1")).as("__n1"), sum("__e1").as("__s1"),
        count(col("__em")).as("__nm"), sum("__em").as("__sm"))
      .select(col("stream"), col("n_obs"),
        round(col("__s1").cast("double") / 100.0 / col("__n1"), 6)
          .as("mae_naive"),
        round(when(col("__nm") > 0,
          col("__sm").cast("double") / 100.0 / col("__nm")), 6)
          .as("mae_seasonal"),
        round(when(col("__nm") > 0 && col("__s1") > 0,
          (col("__sm").cast("double") * col("__n1")) /
            (col("__s1") * col("__nm"))), 6).as("mase"))
  }

  /** Two-sided CUSUM drift monitor per stream (Page 1954) — the
    * change-point detector behind "did this metric drift mid-run":
    * `S+_t = max(0, S+_{t-1} + x_t - target - slack)` and the mirror
    * `S-`, first crossing of `h` decides. The recursion is
    * window-expressible without a sequential loop: `S+_t = P_t -
    * min(0, min_{j<=t} P_j)` with `P` the cumulative sum of
    * `x - target - slack` — a running sum plus a running min, both
    * over the (seq-ordered, uniqueness-probed like sprtDecision)
    * per-stream window. One window pass + one aggregate. */
  def cusumDrift(df: DataFrame, streamCol: String, seqCol: String,
      valueCol: String, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    require(slack >= 0 && threshold > 0,
      s"bad slack=$slack threshold=$threshold")
    val dup = df.groupBy(col(streamCol), col(seqCol))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"cusumDrift: duplicate $seqCol=${dup.headOption.map(_.get(1))} " +
        s"in stream ${dup.headOption.map(_.get(0))} — the walk order " +
        "would be nondeterministic")
    val w = Window.partitionBy(streamCol).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("double")
    val walked = df
      .withColumn("__p", sum(x - target - slack).over(w))
      .withColumn("__n", sum(x - target + slack).over(w))
      .withColumn("__sp", col("__p") - least(lit(0.0),
        min("__p").over(w)))
      .withColumn("__sn", greatest(lit(0.0),
        max("__n").over(w)) - col("__n"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(streamCol).orderBy(col(seqCol))))
      .withColumn("__cross",
        when(col("__sp") > threshold, "drift_up")
          .when(col("__sn") > threshold, "drift_down"))
    walked.groupBy(col(streamCol).as("stream"))
      .agg(count(lit(1)).as("n_obs"),
        min(when(col("__cross").isNotNull,
          struct(col("__rn").cast("long").as("s"),
            col("__cross").as("d")))).as("__fc"),
        round(max("__sp"), 6).as("s_up_max"),
        round(max("__sn"), 6).as("s_down_max"))
      .select(col("stream"), col("n_obs"),
        coalesce(col("__fc").getField("d"), lit("in_control"))
          .as("decision"),
        coalesce(col("__fc").getField("s"), col("n_obs"))
          .as("n_at_decision"),
        col("s_up_max"), col("s_down_max"))
  }
}
