package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the "what is in this 100 TB directory"
  * first touch of any ingest: per column null count, exact distinct
  * count, and type-appropriate extremes/totals, long-format
  * (col_name, metric, value). The reference's equivalent is pandas
  * `describe()`-style driver peeking; here the whole profile is ONE
  * wide aggregate over one scan, unpivoted engine-side (no collect).
  *
  * Metrics by column kind:
  *   - every column: `n_null`, `n_distinct`
  *   - numeric: `min_val`, `max_val` (exact), `sum_val`
  *     (decimal(28,4)-summed, so cross-engine exact, then double)
  *   - string: `min_len`, `max_len`, `sum_len`
  *   - anything else (dates, binaries, …): the two universal metrics
  *
  * Scale note: multiple exact `count_distinct`s in one aggregate make
  * Catalyst plan an Expand — the scan's rows are replicated once per
  * distinct-counted column before the partial agg. Mixing them into
  * the same aggregate as the other metrics makes EVERY metric
  * expression ride those multiplied rows (measured 14 s vs ~1 s at
  * sf0.1), so the profile runs as TWO scans: a moments pass (all
  * non-distinct metrics, one thin agg) and a distinct pass (only
  * (gid, value) lanes through the Expand), cross-joined 1-row x 1-row.
  * At 100 TB x many columns prefer `approxDistinct = true` (HLL
  * sketch, no Expand, ±2%, single scan) — the flag swaps only the
  * distinct expression, everything else stays exact. */
object Profile {

  /** Kind tag shared with oracle-SQL generation: "num", "str", "other". */
  def kindOf(dt: DataType): String = dt match {
    case _: NumericType => "num"
    case StringType => "str"
    case _ => "other"
  }

  private def momentExprs(c: String, kind: String)
      : Seq[(String, Column)] = {
    val universal = Seq(
      "n_null" -> (count(lit(1)) - count(col(c))).cast("double"))
    val typed = kind match {
      case "num" => Seq(
        "min_val" -> min(col(c)).cast("double"),
        "max_val" -> max(col(c)).cast("double"),
        "sum_val" -> sum(col(c).cast("decimal(28,4)")).cast("double"))
      case "str" => Seq(
        "min_len" -> min(length(col(c))).cast("double"),
        "max_len" -> max(length(col(c))).cast("double"),
        "sum_len" -> sum(length(col(c)).cast("long")).cast("double"))
      case _ => Seq.empty
    }
    universal ++ typed
  }

  private def distinctExpr(c: String, approxDistinct: Boolean): Column =
    (if (approxDistinct) approx_count_distinct(col(c))
     else count_distinct(col(c))).cast("double")

  /** Long-format profile of `cols` (default: all). */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty,
      approxDistinct: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val kinds = names.map(c => c -> kindOf(df.schema(c).dataType))
    val momentAggs = kinds.flatMap { case (c, k) =>
      momentExprs(c, k).map { case (m, e) => e.as(s"${c}__$m") }
    }
    val distinctAggs = kinds.map { case (c, _) =>
      distinctExpr(c, approxDistinct).as(s"${c}__n_distinct") }
    // exact count_distinct plans an Expand, so its metrics aggregate
    // SEPARATELY (the multiplied rows carry only (gid, value) lanes,
    // not every moment expression); the HLL flavor needs no Expand and
    // rides in the moments aggregate — truly ONE scan, the whole point
    // of approxDistinct at 100 TB
    val wide =
      if (approxDistinct) {
        val all = momentAggs ++ distinctAggs
        df.agg(all.head, all.tail: _*)
      } else df.agg(momentAggs.head, momentAggs.tail: _*)
        .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    // unpivot the single row engine-side
    val cells = kinds.flatMap { case (c, k) =>
      ("n_distinct" +: momentExprs(c, k).map(_._1)).map { m =>
        struct(lit(c).as("col_name"), lit(m).as("metric"),
          col(s"${c}__$m").as("value")) }
    }
    wide.select(explode(array(cells: _*)).as("cell"))
      .select(col("cell.col_name").as("col_name"),
        col("cell.metric").as("metric"), col("cell.value").as("value"))
  }

  /** Per-group z-score of an integral column — per-domain score
    * calibration (a source's "long doc" means nothing next to another
    * source's until normalized). Exactness across engines: the group
    * moments are DECIMAL sums of exact integers, and the remaining
    * arithmetic is a fixed double-op sequence both engines replay
    * bit-identically, so `round(z, 6)` oracle-matches. Sample variance
    * (n-1); degenerate groups (n < 2 or zero variance) get a null z.
    *
    * Shape: one tiny grouped agg (K rows) broadcast-joined back — the
    * corpus itself never shuffles. */
  def zscoreBy(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val x = col(valueCol).cast("long")
    val stats = df.groupBy(groupCol).agg(
      count(x).as("__n"),
      sum(x.cast("decimal(38,0)")).cast("double").as("__s1"),
      // cast BEFORE the square: x*x in LONG overflows past ~3e9
      sum(x.cast("decimal(38,0)") * x).cast("double").as("__s2"))
    val mean = col("__s1") / col("__n")
    val varS = (col("__s2") - col("__s1") * col("__s1") / col("__n")) /
      (col("__n") - 1)
    df.join(broadcast(stats), groupCol)
      .withColumn("zscore",
        when(col("__n") >= 2 && varS > 0,
          round((x.cast("double") - mean) / sqrt(varS), 6)))
      .drop("__n", "__s1", "__s2")
  }

  /** Data-contract validation — the "expectations" report every ingest
    * gate runs before data is allowed downstream (the Great-
    * Expectations idea recast as ONE aggregate): each rule is a named
    * boolean predicate; output is one row per rule with its violation
    * count and the checked-row total. Everything rides a single thin
    * agg pass (sum of ints), map-side combined; unpivoted engine-side
    * via stack — no collect, no second scan. A uniqueness rule needs a
    * grouped pass, so it is a separate optional input: pass
    * `uniqueKey = Some(col)` and its duplicate-ROW count (rows beyond
    * the first per value, the usual contract meaning) is unioned in. */
  def expectations(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKey: Option[String] = None): DataFrame = {
    require(rules.nonEmpty || uniqueKey.nonEmpty, "no rules")
    // rule names are data, not SQL: the stack() call below quotes the
    // label (with '' escaping) and backticks the alias reference, so
    // spaces/dashes/quotes in a human-readable rule label are legal;
    // only backticks and newlines (unquotable in an identifier) are
    // rejected up front
    rules.foreach { case (name, _) =>
      require(!name.contains("`") && !name.exists(_ < ' '),
        s"rule name cannot contain backticks or control chars: '$name'")
    }
    val viol = rules.map { case (name, pred) =>
      // NULL predicate result counts as a violation: an un-evaluable
      // expectation is a failed expectation, not a silent pass
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    val base = df.agg(count(lit(1)).as("__total"), viol: _*)
    def lab(n: String): String = "'" + n.replace("'", "''") + "'"
    val stacked = base.select(
      expr(s"stack(${rules.size}, " +
        rules.map { case (n, _) => s"${lab(n)}, `__v_$n`" }.mkString(", ") +
        ") as (rule, violations)"),
      col("__total").as("n_rows"))
    uniqueKey.fold(stacked) { k =>
      val dups = df.groupBy(col(k)).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
          coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
        .select(lit(s"unique_$k").as("rule"), col("violations"),
          col("n_rows"))
      stacked.unionByName(dups)
    }
  }

  /** Dataset card — the one-table summary a corpus release ships with
    * (HuggingFace dataset-card numbers): doc/source/language counts,
    * token and char totals, exact-duplicate rate, null-text rate, and
    * the median length. ONE aggregate pass over one scan (the distinct
    * counts ride the same Expand), stack-unpivoted to long format
    * `(metric, value)` with every value a double. */
  def datasetCard(df: DataFrame, textCol: String, sourceCol: String,
      langCol: String, charsCol: String): DataFrame = {
    val tok = graft.functions.TextFunctions.tokenCount(col(textCol))
    val agg = df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      countDistinct(col(langCol)).as("n_langs"),
      sum(tok.cast("long")).as("total_tokens"),
      sum(col(charsCol).cast("long")).as("total_chars"),
      count(col(textCol)).as("n_text"),
      countDistinct(md5(col(textCol))).as("n_uniq"),
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $charsCol)")
        .as("p50_chars"))
    agg.select(expr(
      """stack(8,
        |  'n_docs', CAST(n_docs AS DOUBLE),
        |  'n_sources', CAST(n_sources AS DOUBLE),
        |  'n_langs', CAST(n_langs AS DOUBLE),
        |  'total_tokens', CAST(total_tokens AS DOUBLE),
        |  'total_chars', CAST(total_chars AS DOUBLE),
        |  'exact_dup_rate',
        |    ROUND(1.0 - n_uniq / CAST(n_text AS DOUBLE), 6),
        |  'null_text_rate',
        |    ROUND((n_docs - n_text) / CAST(n_docs AS DOUBLE), 6),
        |  'p50_chars', CAST(p50_chars AS DOUBLE)
        |) as (metric, value)""".stripMargin))
  }

  /** DuckDB oracle for [[profile]] (exact-distinct flavor) over
    * `table`, given the same (column, kind) list — one UNION ALL arm
    * per metric, each arithmetic mirrored exactly. */
  def oracleSql(table: String, cols: Seq[(String, String)]): String = {
    def arms(c: String, kind: String): Seq[(String, String)] = {
      val universal = Seq(
        "n_null" -> s"CAST(COUNT(*) - COUNT($c) AS DOUBLE)",
        "n_distinct" -> s"CAST(COUNT(DISTINCT $c) AS DOUBLE)")
      val typed = kind match {
        case "num" => Seq(
          "min_val" -> s"CAST(MIN($c) AS DOUBLE)",
          "max_val" -> s"CAST(MAX($c) AS DOUBLE)",
          "sum_val" -> s"CAST(SUM(CAST($c AS DECIMAL(28,4))) AS DOUBLE)")
        case "str" => Seq(
          "min_len" -> s"CAST(MIN(len($c)) AS DOUBLE)",
          "max_len" -> s"CAST(MAX(len($c)) AS DOUBLE)",
          "sum_len" -> s"CAST(SUM(len($c)) AS DOUBLE)")
        case _ => Seq.empty
      }
      universal ++ typed
    }
    cols.flatMap { case (c, k) => arms(c, k).map { case (m, e) =>
      s"SELECT '$c' AS col_name, '$m' AS metric, $e AS value FROM $table" }
    }.mkString("\nUNION ALL ")
  }

  /** Per-group (count, sum) stats — the maintained quantity of
    * [[incrementalGroupStats]], exposed so callers build the initial
    * base stats with the exact same arithmetic. Long-exact. */
  def groupStats(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("sum_val"))

  /** Incremental per-group stats maintenance under id-keyed UPSERTS —
    * the CDC companion of [[graft.operators.Dedup.snapshotMerge]] for
    * AGGREGATES: when a nightly delta lands, the per-source corpus
    * stats are maintained as
    *
    * {{{ new = baseStats - stats(replaced base rows) + stats(delta) }}}
    *
    * so the full base corpus is NEVER rescanned. The only base-sized
    * work is the semi-join fetching the delta ids' OLD rows — a
    * point-lookup pass that bucketing/Z-order on the id turns into a
    * pruned read at 100 TB — and the delta-sized aggregate; output is
    * identical to recomputing `groupStats` over the merged corpus
    * (pinned by spec and the from-scratch oracle). Groups whose last
    * row was replaced away drop out (n_rows = 0), matching the
    * from-scratch result; count/sum are LONG-exact so subtraction is
    * safe (means/variances would need the signed-moment form). */
  def incrementalGroupStats(baseStats: DataFrame, base: DataFrame,
      delta: DataFrame, idCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val removed = groupStats(
        base.join(delta.select(col(idCol)).distinct(), Seq(idCol),
          "left_semi"),
        groupCol, valueCol)
      .select(col(groupCol), (-col("n_rows")).as("n_rows"),
        (-col("sum_val")).as("sum_val"))
    val added = groupStats(delta, groupCol, valueCol)
    baseStats.select(col(groupCol), col("n_rows"), col("sum_val"))
      .unionByName(removed).unionByName(added)
      .groupBy(col(groupCol))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_val")).as("sum_val"))
      .filter(col("n_rows") > 0)
  }

  /** Categorical-mix Shannon entropy per group — "is this source one
    * language or a contamination soup?" (group = source, category =
    * lang is the canonical use; any categorical works). Output per
    * group: row count, category count, entropy in bits
    * (`-Σ p·ln(p)/ln(2)`, the exact expression shape both engines
    * replay; 6dp absorbs term order), plus the dominant category and
    * its share (`(count DESC, category)` tie-broken). Shapes: one hash
    * aggregate to the (group x category) frame, then a group-sized
    * window + aggregate — corpus size appears once. */
  def mixEntropy(df: DataFrame, groupCol: String, catCol: String)
      : DataFrame = {
    val byG = Window.partitionBy("__g")
    val c = df.select(col(groupCol).as("__g"), col(catCol).as("__c"))
      .groupBy("__g", "__c").agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum("n").over(byG))
      .withColumn("__p", col("n") / col("__tot").cast("double"))
      .withColumn("__rk",
        row_number().over(byG.orderBy(col("n").desc, col("__c"))))
    c.groupBy("__g")
      .agg(max("__tot").as("n_rows"),
        count(lit(1)).as("n_cats"),
        round(-sum(col("__p") * log(col("__p")) / log(lit(2.0))), 6)
          .as("entropy"),
        max(when(col("__rk") === 1, col("__c"))).as("top_cat"),
        round(max(when(col("__rk") === 1, col("__p"))), 6)
          .as("top_share"))
      .select(col("__g").as(groupCol), col("n_rows"), col("n_cats"),
        col("entropy"), col("top_cat"), col("top_share"))
  }

  /** Fixed-width histogram per group: `bin = floor(x / width)` — a
    * DECLARED grid, not a min/max-derived one, so it needs ONE pass
    * (a data-derived grid needs a scan just to size the bins and its
    * edges shift whenever the data does — useless for cross-snapshot
    * drift diffs). `floor` of one IEEE division is engine-exact;
    * shares round 6dp. Empty bins are absent (sparse output — at
    * corpus scale a dense grid join would manufacture rows). Map-only
    * projection + one hash aggregate + a group-sized window. */
  def histogramFixed(df: DataFrame, groupCol: String, xCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"bad width: $width")
    val byG = Window.partitionBy(groupCol)
    df.filter(col(xCol).isNotNull)
      .select(col(groupCol),
        floor(col(xCol).cast("double") / width).cast("long").as("bin"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(col("bin") * width, 2))
      .withColumn("share",
        round(col("n") / sum("n").over(byG).cast("double"), 6))
      .select(col(groupCol), col("bin"), col("bin_lo"), col("n"),
        col("share"))
  }

  /** Mergeable quantile estimates from the DECLARED fixed-width grid —
    * the 100 TB answer to "p99 without a global sort": the
    * [[histogramFixed]] bins ARE the sketch (map-side combinable,
    * snapshot-mergeable, error <= width by construction — a DECLARED
    * bound, unlike GK/t-digest whose error rides the data), and the
    * estimate interpolates inside the first bin whose cumulative count
    * reaches `p·n`: `bin_lo + width · (p·n − cum_prev) / bin_n`.
    * Deterministic: every quantity is integer counts or one double
    * expression, identical on any IEEE engine.
    *
    * One hash aggregate + a bins-sized window and probs-sized
    * cross-join — corpus size appears once. */
  def histogramQuantiles(df: DataFrame, groupCol: String, xCol: String,
      width: Double, probs: Seq[Double] = Seq(0.5, 0.9, 0.99))
      : DataFrame = {
    require(width > 0, s"bad width: $width")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"bad probs: $probs")
    val byG = Window.partitionBy(groupCol)
    val cumW = byG.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bins = df.filter(col(xCol).isNotNull)
      .select(col(groupCol),
        floor(col(xCol).cast("double") / width).cast("long").as("bin"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum("bn").over(cumW))
      .withColumn("n", sum("bn").over(byG))
    val sp = df.sparkSession
    import sp.implicits._
    val pf = bins.crossJoin(probs.toDF("prob"))
    pf.withColumn("target", col("prob") * col("n"))
      .filter(col("cum") >= col("target"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol), col("prob"))
          .orderBy(col("bin"))))
      .filter(col("__rk") === 1)
      .withColumn("est", round(
        col("bin") * width + lit(width) *
          (col("target") - (col("cum") - col("bn"))) / col("bn"), 6))
      .select(col(groupCol), col("prob"), col("n"), col("est"))
  }

  /** Top-k categories with an explicit `(other)` rollup row — the
    * reporting table every dashboard draws ("top 10 sources, rest
    * folded"). Rank is `(count desc, category asc)` so ties are
    * deterministic; shares are count ratios. The rank window runs on
    * the category frame only (one hash aggregate reduces the corpus
    * first); its single-partition sort is category-cardinality-
    * bounded, the accepted K-sized class. */
  def topKWithOthers(df: DataFrame, catCol: String, k: Int)
      : DataFrame = {
    require(k >= 1 && k <= 100000, s"bad k: $k")
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val rk = Window.orderBy(col("__n").desc, col("__c").asc)
    counts
      .withColumn("__rk", row_number().over(rk))
      .withColumn("category",
        when(col("__rk") <= k, col("__c")).otherwise(lit("(other)")))
      .groupBy("category")
      .agg(sum("__n").as("n"), count(lit(1)).as("n_categories"))
      .withColumn("share", round(col("n") /
        sum("n").over(Window.partitionBy()).cast("double"), 6))
      .orderBy(col("n").desc, col("category"))
  }

  /** Concentration indices of a categorical dimension — the
    * Herfindahl–Hirschman index `HHI = Σ share²`, its inverse (the
    * "effective number of categories"), and the CR-k concentration
    * ratio (top-k share, deterministic `(count desc, category)`
    * rank) — the market-concentration numbers next to
    * [[graft.operators.Stats.giniConcentration]]. HHI is kept as the
    * integral-ratio `Σ c² / n²` with the squares in decimal(38,0)
    * (corpus-scale counts square past BIGINT), so every output is
    * one float expression. The rank window runs on the category
    * frame only. */
  def concentrationIndex(df: DataFrame, catCol: String, k: Int = 4)
      : DataFrame = {
    require(k >= 1, s"bad k: $k")
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val rk = Window.orderBy(col("__n").desc, col("__c").asc)
    val agg = counts
      .withColumn("__rk", row_number().over(rk))
      .agg(count(lit(1)).as("n_categories"),
        sum("__n").as("n"),
        sum(col("__n").cast("decimal(19,0)") *
          col("__n").cast("decimal(19,0)")).as("__sq"),
        sum(when(col("__rk") <= k, col("__n")).otherwise(0L))
          .as("__topk"))
    val hhi = col("__sq").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    agg.select(col("n"), col("n_categories"),
      round(hhi, 6).as("hhi"),
      round(when(col("__sq") > 0,
        (col("n").cast("double") * col("n").cast("double")) /
          col("__sq").cast("double")), 6).as("effective_categories"),
      round(col("__topk") / col("n").cast("double"), 6)
        .as(s"cr$k"))
  }

  /** Log₂ (order-of-magnitude) histogram of a positive integral
    * column — the "how big are documents, really" profile whose bins
    * stay readable from bytes to gigabytes. Bin = BIT LENGTH of the
    * value (`floor(log₂ x) + 1`), computed from the binary-string
    * length — exact integer arithmetic, immune to the
    * `ln(1024)/ln(2) = 9.999…` float-boundary bug a log-division bin
    * would inherit. Non-positive values are counted out loudly in a
    * `bin 0` row rather than dropped. One hash aggregate. */
  def logHistogram(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    df.filter(v.isNotNull)
      .select(when(v > 0, length(bin(v)).cast("long"))
        .otherwise(lit(0L)).as("bin"), v.as("__v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("__v").as("min_v"),
        max("__v").as("max_v"))
      .orderBy("bin")
  }

  /** IQR (Tukey-fence) outlier report per group — the box-plot
    * numbers: discrete p25/p75 via [[groupedPercentiles]]' machinery,
    * the 1.5×IQR fences, and how much of each group falls outside
    * them. Fences are single float expressions over the exact
    * disc-quantile values, so the whole report is oracle-exact; the
    * fence comparison is strict (`v < lo or v > hi`), matching the
    * Tukey convention. One extra corpus pass against the
    * groups-sized fence frame. */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val q = groupedPercentiles(df, groupCol, valueCol,
      Seq(0.25, 0.75))
    val fences = q.groupBy(col(groupCol).as("__fg"))
      .agg(max(when(col("pct") === 0.25, col("value"))).as("p25"),
        max(when(col("pct") === 0.75, col("value"))).as("p75"))
      .withColumn("lo_fence",
        col("p25") - lit(1.5) * (col("p75") - col("p25")))
      .withColumn("hi_fence",
        col("p75") + lit(1.5) * (col("p75") - col("p25")))
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(fences, col(groupCol) === col("__fg"))
      .groupBy(col(groupCol))
      .agg(max("p25").as("p25"), max("p75").as("p75"),
        round(max("lo_fence"), 6).as("lo_fence"),
        round(max("hi_fence"), 6).as("hi_fence"),
        count(lit(1)).as("n"),
        sum(when(col("__v") < col("lo_fence") ||
          col("__v") > col("hi_fence"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers") / col("n").cast("double"), 6))
      .orderBy(groupCol)
  }

  /** Top movers — the "what changed most since last week" report:
    * per category, the latest-week count vs the prior week, ranked by
    * absolute delta with a deterministic `(|delta| desc, category)`
    * tie order; top `k` rows kept. Missing weeks count 0 (a category
    * appearing or vanishing IS a move). One hash aggregate to the
    * (category, week) frame, a broadcast 1-row horizon aggregate,
    * then category-sized reductions. */
  def topMovers(df: DataFrame, catCol: String, weekCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"bad k: $k")
    val counts = df
      .filter(col(catCol).isNotNull && col(weekCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__c"),
        col(weekCol).cast("long").as("__w"))
      .agg(count(lit(1)).as("__n"))
    val horizon = broadcast(counts.agg(max("__w").as("__mx")))
    val wk = counts.crossJoin(horizon)
      .filter(col("__w") >= col("__mx") - 1)
      .groupBy(col("__c"), col("__mx"))
      .agg(
        sum(when(col("__w") === col("__mx") - 1, col("__n"))
          .otherwise(0L)).as("prev_n"),
        sum(when(col("__w") === col("__mx"), col("__n"))
          .otherwise(0L)).as("cur_n"))
    val rk = Window.orderBy(abs(col("cur_n") - col("prev_n")).desc,
      col("__c").asc)
    wk.withColumn("__rk", row_number().over(rk))
      .filter(col("__rk") <= k)
      .select(col("__c").as("category"), col("__mx").as("week"),
        col("prev_n"), col("cur_n"),
        (col("cur_n") - col("prev_n")).as("delta"),
        round(when(col("prev_n") > 0,
          (col("cur_n") - col("prev_n")) /
            col("prev_n").cast("double")), 6).as("pct_change"))
      .orderBy(abs(col("delta")).desc, col("category"))
  }

  /** Order-insensitive table fingerprint per group — the cheap
    * replication/CDC equality check: two snapshots (or a source and
    * its mirror) agree iff their (row count, distinct-row count,
    * XOR-of-row-hashes) triples agree, with no sort and no row-level
    * diff. Row key = md5 over the selected columns joined with a
    * 0x01 separator (concat_ws skips nulls — a null and an empty
    * string are indistinguishable, the documented concat_ws caveat);
    * the 60-bit hash prefix folds under XOR, which commutes — so the
    * fingerprint is one map-side-combinable aggregate at any
    * parallelism. */
  def tableFingerprint(df: DataFrame, groupCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to fingerprint")
    val key = md5(concat_ws("\u0001",
      cols.map(c => col(c).cast("string")): _*))
    val h60 = conv(substring(key, 1, 15), 16, 10).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(key).as("n_distinct_rows"),
        bit_xor(h60).as("xor_fingerprint"))
      .orderBy(groupCol)
  }

  /** Novelty curve — per day, how much of the stream was never seen
    * before: items, distinct keys first-seen that day, and their
    * ratio. The crawl-health readout (a collapsing novelty rate means
    * the crawler is re-fetching the same content). Two hash
    * aggregates (first-seen day per key, then per-day reductions)
    * joined days-sized — the corpus never self-joins. */
  def noveltyCurve(df: DataFrame, dayCol: String, keyCol: String)
      : DataFrame = {
    val base = df
      .filter(col(dayCol).isNotNull && col(keyCol).isNotNull)
      .select(col(dayCol).cast("long").as("__day"),
        col(keyCol).as("__k"))
    val firstSeen = base.groupBy("__k").agg(min("__day").as("__f"))
      .groupBy(col("__f").as("__day"))
      .agg(count(lit(1)).as("n_first_seen"))
    base.groupBy("__day").agg(count(lit(1)).as("n"))
      .join(firstSeen, Seq("__day"), "left")
      .select(col("__day").as(dayCol), col("n"),
        coalesce(col("n_first_seen"), lit(0L)).as("n_first_seen"),
        round(coalesce(col("n_first_seen"), lit(0L)) /
          col("n").cast("double"), 6).as("novelty"))
      .orderBy(dayCol)
  }

  /** Equal-frequency (quantile) binning of a numeric column — the
    * histogram-with-equal-mass profile (decile tables, score bands).
    * Cut points are the k−1 interior discrete quantiles — the value
    * at rank `min{r : r/n >= i/k}`, exactly `percentile_disc` /
    * DuckDB-`quantile_disc` semantics — and assignment is the
    * map-only `1 + Σ(v > cut_i)`, so a value equal to a cut lands in
    * the lower bin and ties never straddle engine-dependently. Per
    * bin: `(bin, n, min_v, max_v)`. Bins can be UNEVEN under heavy
    * ties (all copies of one value share a bin) and a constant
    * column yields one bin — the discrete quantile convention.
    *
    * Scale shape — why NOT `percentile_disc` itself: Spark's exact
    * percentile aggregate buffers a value→count map per partial, so
    * a near-continuous 100 TB column blows the aggregation buffer.
    * Here the cuts come from the [[GlobalOrder.valueRank]] machinery
    * instead: monotone value-range shards (equal values always share
    * a shard) → one map-side-combined count pass (bounded driver
    * collect) → driver arithmetic locates each target rank's shard →
    * ONE window job over only the k−1 needed shards extracts the cut
    * values. Memory rides shard width, never distinct-value count;
    * heavy ties concentrating in one shard are the same documented
    * bound as valueRank. Then cuts broadcast back for a map-only
    * assignment + one hash aggregate. */
  def equalFreqBins(df: DataFrame, valueCol: String, k: Int,
      maxShards: Int = 65536): DataFrame = {
    require(k >= 2 && k <= 1000, s"bad k: $k")
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val binStats = (bin: Column) => v
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), min("__v").as("min_v"),
        max("__v").as("max_v"))
      .orderBy("bin")
    val stats = v.agg(min("__v").as("mn"), max("__v").as("mx")).first()
    if (stats.isNullAt(0) || stats.getDouble(0) == stats.getDouble(1))
      return binStats(lit(1L)) // empty or constant: one bin (or none)
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val width = (mx - mn) / maxShards
    val shardOf = floor((col("__v") - lit(mn)) / lit(width))
      .cast("long")
    val counts = v.groupBy(shardOf.as("__s")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    // target rank per cut i: smallest r with r/n >= i/k — the literal
    // cume_dist definition, evaluated in the same doubles both
    // engines use for the percentile fraction. Small-n duplicates are
    // KEPT (k-1 cuts always, as the SQL formulation has) so bin ids
    // match the oracle even when several quantiles coincide.
    val rankOfCut = (1 until k).map { i =>
      val p = i.toDouble / k
      val est = math.ceil(p * n).toLong
      if ((est - 1).toDouble / n >= p) est - 1 else est
    }
    // walk the cumulative shard counts: rank -> (shard, rank in shard)
    var cum = 0L
    val where = scala.collection.mutable.LinkedHashMap
      .empty[Long, (Long, Long)]
    val it = rankOfCut.distinct.sorted.iterator
    var want = if (it.hasNext) it.next() else -1L
    counts.foreach { case (s, c) =>
      while (want > 0 && want <= cum + c) {
        where(want) = (s, want - cum)
        want = if (it.hasNext) it.next() else -1L
      }
      cum += c
    }
    val bySha = where.values.toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val pick = bySha.map { case (s, rs) =>
      col("__s") === s && col("__rn").isInCollection(rs)
    }.reduce(_ || _)
    val got = v.withColumn("__s", shardOf)
      .filter(col("__s").isInCollection(bySha.keys.toSeq))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__s").orderBy("__v")))
      .filter(pick)
      .select("__s", "__rn", "__v").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getDouble(2))
      .toMap
    val cuts = rankOfCut.map(r => got(where(r)))
    val bin = cuts.map(c =>
      when(col("__v") > lit(c), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    binStats(bin)
  }

  /** Per-group discrete percentiles (the p50/p90/p99 latency table)
    * — [[equalFreqBins]]' sharded-rank machinery generalized to
    * groups, with the driver walk replaced by a fully DISTRIBUTED
    * rank→shard location so group count is unbounded: value-shard
    * counts per group (one hash aggregate), cumulative-offset window
    * over the (group, shard) frame, target ranks as column arithmetic
    * on a broadcast percentile list, a range-located picks frame, and
    * ONE window over only the picked shards. `percentile_disc`
    * semantics per group (smallest value with cume_dist ≥ p),
    * memory bounded by shard width — never by distinct values or
    * group count. Output: `(group, pct, value)` long form. */
  def groupedPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double], maxShards: Int = 65536)
      : DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"bad percentiles: $ps")
    require(ps == ps.sorted && ps.distinct == ps,
      s"percentiles must be sorted distinct: $ps")
    val spark = df.sparkSession
    import spark.implicits._
    // persist the projected (group, value) frame (r15): THREE separate
    // passes read it — the eager min/max probe, the shard-count
    // aggregate, and the picked-shard rank window — so an unpersisted
    // input replays its upstream (a parquet scan at best, a computed
    // pipeline at worst) three times. The projection is two columns,
    // the narrowest form of the input, released with the tracked
    // registry like every operator-internal cache. Callers that
    // already persisted their input (madByGroup, trimmedMean) skip
    // the second copy — the three passes then read their cache
    // through the cheap projection instead of materializing it twice.
    val v0 = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(valueCol).cast("double").as("__v"))
    val v = if (TrackedCaches.isCached(df)) v0 else TrackedCaches.persist(v0)
    val stats = v.agg(min("__v").as("mn"), max("__v").as("mx")).first()
    if (stats.isNullAt(0))
      return v.select(col("__g").as(groupCol),
        lit(0.0).as("pct"), col("__v").as("value")).limit(0)
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val width = if (mx == mn) 1.0 else (mx - mn) / maxShards
    val shardOf = floor((col("__v") - lit(mn)) / lit(width))
      .cast("long")
    val cnt = v.groupBy(col("__g"), shardOf.as("__s")).count()
    val byG = Window.partitionBy("__g")
    val cum = cnt
      .withColumn("__cb", coalesce(sum("count").over(
        byG.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum("count").over(byG))
    // smallest rank r with r/n >= p, in the same doubles the disc-
    // percentile definition uses
    val est = ceil(col("pct") * col("__n")).cast("long")
    val targets = cum.select("__g", "__n").distinct()
      .crossJoin(broadcast(ps.toDF("pct")))
      .withColumn("__r",
        when((est - 1).cast("double") / col("__n") >= col("pct"),
          est - 1).otherwise(est))
    // rename EVERY pick-side column: picks shares v's lineage through
    // cnt, so unrenamed attributes would make the re-join ambiguous
    // (the attributionCredit self-join lesson)
    val picks = targets.join(cum, Seq("__g"))
      .filter(col("__r") > col("__cb") &&
        col("__r") <= col("__cb") + col("count"))
      .select(col("__g").as("__pg"), col("__s").as("__psh"),
        col("pct"), (col("__r") - col("__cb")).as("__rn_want"))
    val ranked = v.withColumn("__s", shardOf)
      .join(picks.select("__pg", "__psh").distinct(),
        col("__g") === col("__pg") && col("__s") === col("__psh"),
        "left_semi")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__g", "__s").orderBy("__v")).cast("long"))
    ranked.join(picks,
        col("__g") === col("__pg") && col("__s") === col("__psh") &&
          col("__rn") === col("__rn_want"))
      .select(col("__g").as(groupCol), col("pct"),
        col("__v").as("value"))
      .orderBy(groupCol, "pct")
  }

  /** Referential-integrity audit — the orphan-detection pass every
    * star-schema ingest needs before a fact table is trusted: how
    * many child rows carry a foreign key with no matching parent,
    * how many distinct keys are dangling, and what fraction of the
    * child that is. Null FKs are counted separately (a null is a
    * missing link, not a dangling one).
    *
    * One row: `(relation, child_rows, null_fk, orphan_rows,
    * orphan_keys, orphan_rate)` — all integral counts plus one
    * guarded ratio, so the audit is oracle-exact.
    *
    * Scale shape: the parent side is reduced to DISTINCT keys before
    * the join (parent payload never shuffles), then one left
    * equi-join child→keys and a single aggregate. At 100 TB the join
    * shuffles on the key both sides exactly once; a dimension-sized
    * parent broadcasts under AQE automatically. */
  def fkAudit(child: DataFrame, fkCol: String, parent: DataFrame,
      pkCol: String, relation: String): DataFrame = {
    val keys = parent.select(col(pkCol).as("__pk")).distinct()
    child.select(col(fkCol).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("child_rows"),
        sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("null_fk"),
        sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)).as("orphan_rows"),
        count_distinct(when(col("__fk").isNotNull && col("__pk").isNull,
          col("__fk"))).as("orphan_keys"))
      .select(lit(relation).as("relation"), col("child_rows"),
        col("null_fk"), col("orphan_rows"), col("orphan_keys"),
        round(when(col("child_rows") > 0,
          col("orphan_rows") / col("child_rows").cast("double")), 6)
          .as("orphan_rate"))
  }

  /** Median absolute deviation per group — the robust scale estimate
    * (outlier-immune σ) every monitoring threshold should prefer over
    * stddev on heavy-tailed metrics. Two [[groupedPercentiles]]
    * passes (median of v, then median of |v − median|), so the memory
    * story is the sharded-rank one — never a distinct-value buffer —
    * and both medians are `percentile_disc`-exact data values.
    * Output: `(group, n, median, mad)`. */
  def madByGroup(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val base = TrackedCaches.persist(
      df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
        .select(col(groupCol).as("__g"),
          col(valueCol).cast("double").as("__v")))
    val med = groupedPercentiles(base, "__g", "__v", Seq(0.5))
      .select(col("__g"), col("value").as("median"))
    // the percentile machinery takes several passes over its input —
    // persist the deviation frame like the base, or each pass replays
    // the broadcast join
    val dev = TrackedCaches.persist(
      base.join(broadcast(med), Seq("__g"))
        .select(col("__g"), abs(col("__v") - col("median")).as("__d")))
    val mad = groupedPercentiles(dev, "__g", "__d", Seq(0.5))
      .select(col("__g"), col("value").as("mad"))
    base.groupBy("__g").agg(count(lit(1)).as("n"))
      .join(broadcast(med), Seq("__g"))
      .join(broadcast(mad), Seq("__g"))
      .select(col("__g").as(groupCol), col("n"), col("median"),
        col("mad"))
  }

  /** Trimmed mean per group at a DECLARED integer scale: values
    * outside the [loQ, hiQ] `percentile_disc` band are dropped, the
    * surviving mean is an integral-numerator ratio (cent sums in
    * longs), so the whole estimate is oracle-exact — the robust
    * location sibling of [[madByGroup]]'s scale. Output:
    * `(group, n_kept, lo_cut, hi_cut, trimmed_mean)` in natural
    * units. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      scale: Long, loQ: Double = 0.1, hiQ: Double = 0.9): DataFrame = {
    require(scale >= 1, s"bad scale: $scale")
    require(0 < loQ && loQ < hiQ && hiQ < 1, s"bad band [$loQ, $hiQ]")
    val base = TrackedCaches.persist(
      df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
        .select(col(groupCol).as("__g"),
          col(valueCol).cast("double").as("__v")))
    val cuts = groupedPercentiles(base, "__g", "__v", Seq(loQ, hiQ))
      .groupBy("__g")
      .agg(min(when(col("pct") === loQ, col("value"))).as("lo_cut"),
        min(when(col("pct") === hiQ, col("value"))).as("hi_cut"))
    base.join(broadcast(cuts), Seq("__g"))
      .filter(col("__v") >= col("lo_cut") && col("__v") <= col("hi_cut"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n_kept"),
        min("lo_cut").as("lo_cut"), min("hi_cut").as("hi_cut"),
        sum(round(col("__v") * scale, 0).cast("long")).as("__cents"))
      .select(col("__g").as(groupCol), col("n_kept"), col("lo_cut"),
        col("hi_cut"),
        round(col("__cents") /
          (col("n_kept") * scale).cast("double"), 6)
          .as("trimmed_mean"))
  }

  /** Quality-threshold sweep — the curve a filter-threshold decision
    * reads ("at tau = 0.6 we keep 40% of docs but 55% of tokens"):
    * for each candidate threshold, documents kept (score >= tau) and
    * their integral weight mass, as counts and fractions of the
    * corpus. One scan exploded over the THRESHOLDS literal array
    * (thresholds x rows, thresholds is a handful) + one hash
    * aggregate; integral counts, two guarded divisions. Thresholds
    * are compared against the 6dp-rounded score on both engines, so
    * the boundary cannot drift. */
  def thresholdSweep(df: DataFrame, scoreCol: String, wCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 99,
      s"bad thresholds: ${thresholds.size}")
    val tauDf = df.sparkSession
      .createDataFrame(thresholds.map(Tuple1(_))).toDF("tau")
    df.select(round(col(scoreCol).cast("double"), 6).as("__s"),
        col(wCol).cast("long").as("__w"))
      .crossJoin(broadcast(tauDf))
      .groupBy("tau")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__s") >= col("tau"), 1L).otherwise(0L))
          .as("n_kept"),
        sum("__w").as("__tw"),
        sum(when(col("__s") >= col("tau"), col("__w")).otherwise(0L))
          .as("w_kept"))
      .select(col("tau"), col("n_kept"), col("w_kept"),
        round(col("n_kept").cast("double") / col("__n"), 6)
          .as("frac_docs"),
        round(when(col("__tw") > 0,
          col("w_kept").cast("double") / col("__tw")).otherwise(0.0), 6)
          .as("frac_weight"))
  }
}
