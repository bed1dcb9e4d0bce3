package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for: the as-of join
  * (each left row picks the most recent right row at-or-before its
  * timestamp, per key) and the point-in-interval range join.
  *
  * Both are composed from existing relational operators rather than a
  * custom SparkPlan, because the declarative decompositions below
  * already hit the right physical shape:
  *
  *  - as-of: a sort-merge-free formulation would need a custom
  *    co-partitioned zip; the UNION + window formulation gets the same
  *    effect from ONE hash shuffle on the key followed by an in-
  *    partition sort — exactly what a dedicated physical operator would
  *    do, but Catalyst/AQE keep optimizing around it.
  *  - range: the naive `ON key = key AND ts BETWEEN lo AND hi` plans as
  *    a broadcast-nested-loop (or a per-key cartesian under sort-merge)
  *    — quadratic in the hot key. Bucketing the time axis turns it into
  *    a plain equi-join on (key, bucket) plus a residual filter, which
  *    shuffles once and scales linearly in (rows x buckets-per-
  *    interval).
  */
object Temporal {

  /** As-of join: for every left row, attach `payloadCols` from the
    * right row with the same `key` and the greatest `rightTs <=
    * leftTs` (inclusive match — DuckDB/ASOF `>=` semantics). Left rows
    * with no prior right row keep null payloads (left-outer).
    *
    * Right rows sharing an exact (key, ts) instant are tie-broken by
    * the LARGEST `payloadCols.head` value — callers put a unique id
    * first to make the result deterministic.
    *
    * Physical shape: tag both sides, union, and run one window pass
    * `last(payload, ignoreNulls)` ordered by (ts, side, tiebreak) per
    * key. One shuffle on `key`, an in-partition sort, zero joins — at
    * 100 TB the cost is the same single exchange a groupBy(key) pays.
    * A pathologically hot key serializes its partition's sort; salt by
    * coarse time range first if one key dominates the stream.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val existing = left.columns.toSet
    def internal(base: String): String =
      Iterator.from(0).map(i => s"__graft_${base}_$i")
        .find(!existing.contains(_)).get
    val (kc, tc, sc, pc) =
      (internal("k"), internal("ts"), internal("side"), internal("p"))

    // NULL keys must never match (SQL equi-join semantics — the
    // window's partitionBy would otherwise group left and right NULL
    // keys together); left rows with a NULL key still come back with
    // null payloads via the left-outer contract
    val r = right.filter(col(rightTs).isNotNull && col(rightKey).isNotNull)
      .select(col(rightKey).as(kc), col(rightTs).as(tc),
        lit(0).as(sc), struct(payloadCols.map(col): _*).as(pc))
    val l = left.select(
      col(leftKey).as(kc) +: col(leftTs).as(tc) +: lit(1).as(sc) +:
        left.columns.map(col): _*)

    // union-by-name: left rows get a null payload struct, right rows
    // null left columns; the window then threads the last non-null
    // payload forward in (ts, side, tiebreak) order. side=0 sorts
    // right rows before left rows at an equal instant => inclusive
    // (<=) match; the ascending tiebreak makes the LAST same-instant
    // right row the max-payloadCols.head one.
    val u = r.unionByName(l.withColumn(pc,
      lit(null).cast(r.schema(pc).dataType)), allowMissingColumns = true)
    val w = Window.partitionBy(kc)
      .orderBy(col(tc).asc, col(sc).asc, col(pc)(payloadCols.head).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(pc, last(col(pc), ignoreNulls = true).over(w))
      .filter(col(sc) === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(pc)(c).as(c)): _*)
  }

  /** Point-in-interval range join: every left row whose `leftTs` falls
    * in `[startCol, endCol)` of a same-`key` right interval produces
    * one output row (left columns + `intervalCols`). A point meets a
    * covering interval exactly once — the equi-join fires only on the
    * single bucket containing the point, so no post-join dedup.
    *
    * `bucketSeconds` trades replication for selectivity: each interval
    * is exploded into ceil(len/bucket)+1 bucket rows, each point into
    * one. Pick it near the TYPICAL interval length — intervals then
    * expand ~2x while the residual filter discards few candidates. At
    * 100 TB this is one equi-join shuffle on (key, bucket) with
    * interval-side replication bounded by that factor, versus the
    * nested-loop the naive predicate plans to.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      tsCol: String, startCol: String, endCol: String,
      intervalCols: Seq[String], bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    val existing = points.columns.toSet
    def internal(base: String): String =
      Iterator.from(0).map(i => s"__graft_${base}_$i")
        .find(!existing.contains(_)).get
    val (kc, bc, ic) = (internal("k"), internal("b"), internal("iv"))
    def bucketOf(ts: Column): Column =
      floor(unix_timestamp(ts) / bucketSeconds).cast("long")

    val p = points.withColumn(kc, col(pointKey))
      .withColumn(bc, bucketOf(col(tsCol)))
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .select(col(intervalKey).as(kc),
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol))))
          .as(bc),
        struct((startCol +: endCol +: intervalCols).distinct.map(col): _*)
          .as(ic))
    p.join(iv, Seq(kc, bc))
      .filter(col(tsCol) >= col(ic)(startCol) &&
        col(tsCol) < col(ic)(endCol))
      .select(points.columns.map(col) ++
        intervalCols.map(c => col(ic)(c).as(c)): _*)
  }

  /** INTERVAL-overlap join: every same-`key` pair of a left interval
    * `[lStart, lEnd)` and a right interval `[rStart, rEnd)` that
    * OVERLAP (`lStart < rEnd && rStart < lEnd`) produces exactly one
    * output row (`leftCols` + `rightCols`). The genuinely two-sided
    * sibling of [[rangeJoin]] — a point is an interval of length zero,
    * but an interval pair can meet in MANY shared buckets, so the
    * naive bucket equi-join would emit duplicates.
    *
    * Dedup WITHOUT a distinct: a candidate pair is emitted only in the
    * FIRST bucket both intervals inhabit —
    * `bucket == greatest(bucketOf(lStart), bucketOf(rStart))` — which
    * for an overlapping pair is unique and guaranteed to be probed
    * (each side's explode covers its own start bucket through its end
    * bucket). A `distinct` would shuffle the full candidate output a
    * second time; the first-bucket rule is a map-side filter.
    *
    * Scale shape: both sides explode to ceil(len/bucket)+1 rows, ONE
    * equi-join shuffle on (key, bucket), residual overlap filter +
    * first-bucket filter — linear in rows x buckets-per-interval,
    * never the per-key cartesian the raw inequality predicate plans
    * to. Pick `bucketSeconds` near the typical interval length. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      leftCols: Seq[String], rightCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    require(leftCols.nonEmpty && rightCols.nonEmpty,
      "intervalJoin needs output columns from both sides")
    val existing = (leftCols ++ rightCols).toSet
    def internal(base: String): String =
      Iterator.from(0).map(i => s"__graft_${base}_$i")
        .find(!existing.contains(_)).get
    val (kc, bc, lc, rc) =
      (internal("k"), internal("b"), internal("l"), internal("r"))
    def bucketOf(ts: Column): Column =
      floor(unix_timestamp(ts) / bucketSeconds).cast("long")

    // strict s < e: a zero-length [s, s) interval is EMPTY and can
    // never overlap anything — the popular `ls < re && rs < le` test
    // wrongly admits an empty interval sitting strictly inside the
    // other side, so empties are dropped here and the residual filter
    // below uses the non-empty-intersection form
    def side(df: DataFrame, key: String, s: String, e: String,
        cols: Seq[String], out: String): DataFrame =
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) < col(e) &&
          col(key).isNotNull)
        .select(col(key).as(kc),
          explode(sequence(bucketOf(col(s)), bucketOf(col(e)))).as(bc),
          struct((s +: e +: cols).distinct.map(col): _*).as(out))

    side(left, leftKey, lStart, lEnd, leftCols, lc)
      .join(side(right, rightKey, rStart, rEnd, rightCols, rc),
        Seq(kc, bc))
      // non-empty intersection: max(starts) < min(ends)
      .filter(greatest(col(lc)(lStart), col(rc)(rStart)) <
        least(col(lc)(lEnd), col(rc)(rEnd)))
      .filter(col(bc) === greatest(
        floor(unix_timestamp(col(lc)(lStart)) / bucketSeconds),
        floor(unix_timestamp(col(rc)(rStart)) / bucketSeconds))
        .cast("long"))
      .select(leftCols.map(c => col(lc)(c).as(c)) ++
        rightCols.map(c => col(rc)(c).as(c)): _*)
  }

  /** Nearest-event join: for every left row, the single closest right
    * row by |timestamp difference| within `horizonSeconds`, same key —
    * the BIDIRECTIONAL companion to [[asofJoin]] (as-of looks only
    * backward; sensor/label alignment wants the closest reading either
    * way). Ties (equidistant before/after) break to the EARLIER right
    * timestamp, then the first payload column ascending —
    * deterministic, SQL-replayable. Left rows with no right row in the
    * horizon survive with null payloads (left-outer contract).
    *
    * Scale shape: both sides bucket by `horizonSeconds`; a right row
    * can only be nearest-within-horizon to left rows in its bucket ±1,
    * so the candidate join is a hash equi-join on (key, bucket) with a
    * 3-replica right side — never a cartesian, and the per-left-row
    * argmin is a window over candidates only. */
  def nearestJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String], horizonSeconds: Long): DataFrame = {
    require(horizonSeconds > 0,
      s"horizonSeconds must be > 0: $horizonSeconds")
    require(payloadCols.nonEmpty,
      "nearestJoin needs at least one payload column")
    val existing = left.columns.toSet ++ payloadCols
    def internal(base: String): String =
      Iterator.from(0).map(i => s"__graft_${base}_$i")
        .find(!existing.contains(_)).get
    val (kc, bc, ltc, rtc, pc, dc, rnc) =
      (internal("k"), internal("b"), internal("lt"), internal("rt"),
        internal("p"), internal("d"), internal("rn"))

    val l = left.filter(col(leftKey).isNotNull && col(leftTs).isNotNull)
      .withColumn(kc, col(leftKey))
      .withColumn(ltc, unix_timestamp(col(leftTs)))
      .withColumn(bc, floor(col(ltc) / horizonSeconds).cast("long"))
    val r0 = right.filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(col(rightKey).as(kc),
        unix_timestamp(col(rightTs)).as(rtc),
        struct(payloadCols.map(col): _*).as(pc))
    // replicate each right row into its bucket and both neighbors
    val r = r0.withColumn(bc, explode(array(
        floor(col(rtc) / horizonSeconds).cast("long") - 1,
        floor(col(rtc) / horizonSeconds).cast("long"),
        floor(col(rtc) / horizonSeconds).cast("long") + 1)))
    val cand = l.join(r, Seq(kc, bc))
      .withColumn(dc, abs(col(ltc) - col(rtc)))
      .filter(col(dc) <= horizonSeconds)
    // one argmin partition per left row — left rows must be DISTINCT
    // (any real event table has an id column); duplicate left rows
    // would collapse into one output row
    val w = Window
      .partitionBy(Seq(col(kc), col(ltc)) ++ left.columns.map(col): _*)
      .orderBy(col(dc).asc, col(rtc).asc,
        col(pc)(payloadCols.head).asc)
    val best = cand.withColumn(rnc, row_number().over(w))
      .filter(col(rnc) === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(pc)(c).as(c)): _*)
    // left-outer: rows with no candidate come back with null payloads
    val unmatched = left.join(best.select(left.columns.map(col): _*)
        .distinct(), left.columns.toSeq, "left_anti")
    val nulls = payloadCols.foldLeft(unmatched) { (d, c) =>
      d.withColumn(c, lit(null).cast(
        r0.schema(pc).dataType.asInstanceOf[org.apache.spark.sql.types.StructType](c).dataType))
    }
    best.unionByName(nulls)
  }

  /** SCD Type-2 history builder: collapse an observation stream into
    * VALIDITY INTERVALS per entity — one row per attribute-change
    * point, with `valid_from` / `valid_to` (null = open) / `version` /
    * `is_current`. The warehouse dimension-history primitive: point-in-
    * time joins (`valid_from <= t < valid_to`) replace "latest row
    * wins" guesswork downstream.
    *
    * Change detection is null-safe per attribute (a value appearing or
    * disappearing is a change; consecutive identical observations
    * collapse into one version). `tieCol` makes same-timestamp
    * observations a total order — without it version boundaries would
    * be partition-order-dependent and unreplayable.
    *
    * Scale shape: ONE shuffle on the entity key; two window passes
    * (change detection, then numbering/lead over the change rows —
    * the second window runs on the collapsed frame, which is
    * change-sized, not observation-sized). */
  def scd2(df: DataFrame, idCol: String, tsCol: String, tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(idCol).orderBy(col(tsCol), col(tieCol))
    // window expressions must be projected BEFORE the filter (Spark
    // rejects windows inside WHERE); row_number (not lag-is-null)
    // marks the first observation: an all-null first attribute row
    // would otherwise compare null<=>null = true and drop the
    // entity's opening version
    val changed = attrCols.map(c =>
        !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", changed)
      .filter(col("__rn") === 1 || col("__chg"))
      .drop("__rn", "__chg")
    val w2 = Window.partitionBy(idCol).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(col(idCol)) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"),
          col("is_current"))): _*)
  }

  /** OHLC resampling: per (group, fixed time bucket) the Open / High /
    * Low / Close of a value series plus count and a decimal-exact
    * volume sum — the downsample every metric store runs before
    * charting or drift-diffing a high-rate series. Open/Close are
    * `min_by`/`max_by` on `(epoch, tieCol)` (a composite struct — so
    * same-timestamp events resolve deterministically on any engine);
    * one hash aggregate, no windows, output is buckets-sized. */
  def resampleOhlc(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, tieCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds >= 1, s"bad bucketSeconds: $bucketSeconds")
    val sec = unix_timestamp(col(tsCol))
    val ord = struct(sec.as("s"), col(tieCol).as("t"))
    df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol),
        (floor(sec / bucketSeconds) * bucketSeconds).cast("long")
          .as("bucket_start"))
      .agg(count(lit(1)).as("n"),
        min_by(col(valCol), ord).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), ord).as("close"),
        sum(col(valCol).cast("decimal(28,4)")).cast("double")
          .as("volume"))
  }

  /** Calendar densification with last-observation-carried-forward —
    * the gap fill every daily dashboard needs before a rolling window
    * (a missing day otherwise silently shrinks the window and shifts
    * every lag). Per group, the day spine spans `[min(day), max(day)]`
    * (engine-side `sequence` + explode — days-sized, never row-sized);
    * missing days take the most recent observed value and are flagged
    * `filled = true`. The spine span per group is bounded by
    * `maxSpanDays` (ENFORCED — a single corrupt epoch-0 row would
    * otherwise explode the spine by decades).
    *
    * Shapes: one group aggregate for the spans, one days-sized
    * left join + one LOCF window — a single group-key shuffle. */
  def gapFillDaily(df: DataFrame, groupCol: String, dayCol: String,
      xCol: String, maxSpanDays: Int = 36500): DataFrame = {
    require(maxSpanDays >= 1, s"bad maxSpanDays: $maxSpanDays")
    val spans = df.groupBy(col(groupCol).as("__g"))
      .agg(min(col(dayCol).cast("long")).as("__lo"),
        max(col(dayCol).cast("long")).as("__hi"))
    val over = spans.filter(col("__hi") - col("__lo") >= maxSpanDays)
      .orderBy(col("__g")).limit(5).collect()
    require(over.isEmpty,
      s"gapFillDaily: group span exceeds maxSpanDays=$maxSpanDays for " +
        over.map(r => s"${r.get(0)} (${r.getLong(2) - r.getLong(1)} d)")
          .mkString(", ") +
        " — a corrupt timestamp would explode the day spine; clean or " +
        "raise maxSpanDays")
    val spine = spans.select(col("__g"),
      explode(sequence(col("__lo"), col("__hi"))).as("__day"))
    val obs = df.select(col(groupCol).as("__g"),
      col(dayCol).cast("long").as("__day"),
      col(xCol).cast("double").as("__x"))
    val w = Window.partitionBy("__g").orderBy("__day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("__g", "__day"), "left")
      .withColumn("filled", col("__x").isNull)
      .withColumn("__x", last(col("__x"), ignoreNulls = true).over(w))
      .select(col("__g").as(groupCol), col("__day").as(dayCol),
        col("__x").as(xCol), col("filled"))
  }

  /** Count of weekdays (Mon-Fri) in epoch-day interval `(start, end]`
    * — closed-form integer arithmetic, no calendar UDF, no
    * per-day explode. Uses the engine-neutral dow convention
    * `(epochDay + 3) mod 7 == 0 for Monday` (epoch day 0 was a
    * Thursday): `W(d) = 5·⌊(d+3)/7⌋ + min(((d+3) mod 7) + 1, 5) − 3`
    * counts weekdays in `[0, d]` (negative for pre-1970 days, so the
    * interval count `W(end) − W(start)` still telescopes), with mod
    * the FLOOR modulus — both Spark's `%` and DuckDB's take the
    * dividend's sign, which would break every pre-1970 date, so both
    * sides spell it `((x % 7) + 7) % 7`. Every term evaluates
    * identically in Spark and DuckDB. */
  def weekdaysUpTo(epochDay: Column): Column =
    lit(5L) * floor((epochDay + 3L) / 7L).cast("long") +
      least(((epochDay + 3L) % 7L + 7L) % 7L + 1L, lit(5L)) - 3L

  /** THE engine-neutral day-of-week for the whole operator family:
    * `((epochDay + 3) mod 7 + 7) mod 7` with 0 = Monday (epoch day 0
    * was a Thursday), floor-modulus-safe for pre-1970 days. Shared by
    * [[Events.dowProfile]] / [[Events.dowAnomaly]] /
    * [[Stats.seasonalDow]] / [[weekdaysUpTo]] so siblings can join on
    * `dow` without an off-by-one (r9 advice: seasonalDow previously
    * labeled 0=Sunday while its siblings used 0=Monday). */
  def dowOf(epochDay: Column): Column =
    (((epochDay + 3L) % 7L + 7L) % 7L).cast("int")

  /** Run-length encoding of consecutive flagged DAYS per group — the
    * gaps-and-islands streak detector ("how long did that anomaly
    * last?", "longest above-trend run"). A streak is a maximal run of
    * flagged days at step 1; a missing or unflagged day breaks it.
    * Classic `day − row_number` island key over the flagged rows
    * only, so the window frame is flagged-days-sized. Output one row
    * per streak: `(group, start_day, end_day, len)`. */
  def runLengths(df: DataFrame, groupCol: String, dayCol: String,
      flagCol: String): DataFrame = {
    val flagged = df.filter(col(flagCol))
      .select(col(groupCol).as("__g"),
        col(dayCol).cast("long").as("__day"))
    val w = Window.partitionBy("__g").orderBy("__day")
    flagged
      .withColumn("__isl", col("__day") - row_number().over(w))
      .groupBy("__g", "__isl")
      .agg(min("__day").as("start_day"), max("__day").as("end_day"),
        count(lit(1)).as("len"))
      .select(col("__g").as(groupCol), col("start_day"),
        col("end_day"), col("len"))
      .orderBy(groupCol, "start_day")
  }

  /** Business-day lead time between two timestamp columns, grouped —
    * the SLA readout (order-to-ship in working days) that calendar-day
    * diffs overstate by the weekend share. Lead = weekdays in
    * `(start, end]`; same-day and weekend-spanning-only intervals
    * count 0. Negative intervals (end before start) are data errors:
    * counted out loudly in `n_negative`, excluded from the stats.
    *
    * Output per group: `(group, n, n_negative, avg_bdays, min_bdays,
    * max_bdays)` — integral sums and bounded ratios, oracle-exact.
    * Scale shape: map-only closed-form projection + one hash
    * aggregate; no joins, no explode, no calendar table. */
  def businessDayLead(df: DataFrame, groupCol: String,
      startCol: String, endCol: String): DataFrame = {
    val sd = floor(unix_timestamp(col(startCol)) / 86400).cast("long")
    val ed = floor(unix_timestamp(col(endCol)) / 86400).cast("long")
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(groupCol),
        (weekdaysUpTo(ed) - weekdaysUpTo(sd)).as("__bd"),
        (ed < sd).as("__neg"))
      .groupBy(groupCol)
      .agg(
        sum(when(col("__neg"), 0L).otherwise(1L)).as("n"),
        sum(when(col("__neg"), 1L).otherwise(0L)).as("n_negative"),
        round(when(sum(when(col("__neg"), 0L).otherwise(1L)) > 0,
          sum(when(col("__neg"), 0L).otherwise(col("__bd"))) /
            sum(when(col("__neg"), 0L).otherwise(1L)).cast("double")),
          6).as("avg_bdays"),
        min(when(!col("__neg"), col("__bd"))).as("min_bdays"),
        max(when(!col("__neg"), col("__bd"))).as("max_bdays"))
      .orderBy(groupCol)
  }
}
