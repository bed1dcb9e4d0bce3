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
      .filter(col("__cum") >= col("__tot") / 2.0)
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
    * is dropped (no trend is definable from one observation). */
  def mannKendall(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val s = df.select(col(groupCol).as("__g"), col(tCol).as("__t"),
      col(xCol).cast("double").as("__x"))
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
}
