package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the stateful sessionizer. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
    value: Double)

/** One closed (or final open) session. */
final case class SessionRow(user_id: Long, sess_no: Long,
    sess_start: java.sql.Timestamp, sess_end: java.sql.Timestamp,
    n_events: Long, sum_value: Double)

/** Per-user open-session state: `sumCents` keeps the money sum exact
  * (`value` is 2-decimal by construction — see Events.exactValueSum).
  * `n == 0` marks a TOMBSTONE: the session `sessNo` has already been
  * closed and emitted; the record only preserves the numbering so the
  * user's next session is `sessNo + 1` (kept for a bounded retention,
  * then dropped). */
final case class OpenSession(sessNo: Long, startUs: Long, lastUs: Long,
    n: Long, sumCents: Long)

/** Input row for the stateful funnel. */
final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
    event_type: String)

/** Funnel progress emitted per user (epoch-second step times). */
final case class FunnelRow(user_id: Long, t1: Option[Long],
    t2: Option[Long], t3: Option[Long], level: Int)

/** Per-user funnel state; -1L = step not reached. `lastUs` drives the
  * inactivity timeout. */
final case class FunnelProgress(t1: Long, t2: Long, t3: Long, lastUs: Long)

/** Input row for the stateful transition tracker (event_id breaks
  * timestamp ties deterministically, same as the batch operator). */
final case class TransitionEvent(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, event_type: String)

/** One observed step of a user's event sequence. */
final case class TransitionStep(event_type: String, next_type: String)

/** Per-user last-event state: the (ts, event_id, type) of the most
  * recent event, so a later batch chains its first event onto it. */
final case class LastEvent(lastUs: Long, lastId: Long, lastType: String)

final case class TopKEvent(ts: java.sql.Timestamp, event_type: String)

/** One CDC log record: `seq` is the log offset (unique per key). */
final case class ChangeEvent(key: String, seq: Long, op: String,
  value: Double)
/** Net change per key emitted by [[StreamingOps.changelogStateful]]. */
final case class NetChangeRow(key: String, n_changes: Long,
  first_op: String, last_op: String, net_op: String, last_val: Double,
  first_seq: Long, last_seq: Long)
/** Order-insensitive compaction monoid (first/last by seq compare). */
final case class CompactState(n: Long, firstSeq: Long, firstOp: String,
  lastSeq: Long, lastOp: String, lastVal: Double)
final case class TopKRow(window_start: Long, event_type: String,
    n: Long, rank: Int)
final case class WindowCounts(counts: Map[String, Long])

final case class NoveltyEvent(k: String, day: Long)
final case class FirstSeenRow(k: String, day: Long)

final case class FpEvent(group: String, h: Long)
final case class FpRow(group: String, n_rows: Long,
    xor_fingerprint: Long)
final case class FpState(n: Long, x: Long)

final case class AnomalyEvent(key: String, ts: java.sql.Timestamp,
    event_id: Long, value: Double)
final case class AnomalyRow(key: String, ts: java.sql.Timestamp,
    event_id: Long, value: Double, z: Option[Double], anomaly: Boolean)
final case class WelfordState(n: Long, mean: Double, m2: Double,
    lastUs: Long)

/** Structured Streaming surface. The reference has no streaming at all
  * (SURVEY.md §2.10); this is the engine extension for event streams:
  * the same event-time logic as `graft.operators.Events`, plus
  * watermarking so state is bounded under late data.
  *
  * Usage:
  * {{{
  *   val stream = spark.readStream.schema(eventSchema).parquet(dir)
  *   StreamingOps.windowedCounts(stream)
  *     .writeStream.outputMode("update").format("console").start()
  * }}}
  */
object StreamingOps {

  /** Tumbling-window per-type counts with a late-data watermark.
    * Works on both streaming and batch DataFrames (watermark is a no-op
    * in batch), so batch backfill and the live stream share one code
    * path. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Events.exactValueSum)

  /** Sliding (hopping) per-type counts: each event lands in
    * `windowLen / slide` overlapping windows — rolling rates without a
    * self-join (Spark's window() expands to the window set, then one
    * hash-agg). Same batch/stream duality as `windowedCounts`. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), windowLen, slide).getField("start").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Events.exactValueSum)

  /** Stream-static enrichment: attach dimension attributes to an event
    * stream — the canonical stream-static join (Spark re-evaluates the
    * static side per micro-batch; the broadcast hint keeps it off the
    * shuffle path when the dimension is small, which a dimension table
    * should be). Inner join: events with no dimension row are dropped.
    * Identical semantics on a batch frame, so backfill and the live
    * stream share the code path like every operator here. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))

  /** Stream-stream ATTRIBUTION join: each left event ("click") meets
    * every same-key right event ("purchase") inside
    * `[left.ts, left.ts + windowMinutes)`.
    *
    * Streaming: both sides carry watermarks and the join carries the
    * time-range predicate, which is exactly what lets Spark's
    * symmetric stateful join EVICT buffered rows once the watermark
    * passes `ts + window` — bounded state, the one formulation of a
    * stream-stream join that survives an unbounded stream. Append-mode
    * inner join; late events beyond the watermark drop.
    *
    * Batch: the same contract runs through [[graft.operators.Temporal.rangeJoin]]
    * (bucketed equi-join + residual filter) — in batch the raw
    * inequality predicate would plan as a nested loop, while the
    * micro-batch state join amortizes it incrementally. One contract,
    * each mode on its scalable plan (parity spec-pinned, oracle
    * `q_stream_join`).
    */
  def attributionJoin(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", idCol: String = "event_id",
      windowMinutes: Int = 30, watermark: String = "2 hours"): DataFrame = {
    val win = expr(s"INTERVAL $windowMinutes MINUTES")
    if (left.isStreaming || right.isStreaming) {
      val c = left.select(col(idCol).as("click_id"), col(keyCol).as("__lk"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", watermark)
      val p = right.select(col(idCol).as("purchase_id"),
          col(keyCol).as("__rk"), col("ts").as("p_ts"))
        .withWatermark("p_ts", watermark)
      c.join(p, col("__lk") === col("__rk") &&
          col("p_ts") >= col("c_ts") && col("p_ts") < col("c_ts") + win)
        .select(col("click_id"), col("purchase_id"), col("__lk").as(keyCol))
    } else {
      val intervals = left.select(col(idCol).as("click_id"), col(keyCol),
        col("ts").as("w_start"), (col("ts") + win).as("w_end"))
      val points = right.select(col(idCol).as("purchase_id"), col(keyCol),
        col("ts"))
      graft.operators.Temporal.rangeJoin(points, intervals, keyCol, keyCol,
          "ts", "w_start", "w_end", Seq("click_id"),
          bucketSeconds = windowMinutes.toLong * 60L)
        .select("click_id", "purchase_id", keyCol)
    }
  }

  /** One MERGE step of the streaming snapshot maintainer: fold a batch
    * of (id, text) upserts into the previous snapshot. Pure function of
    * (prev, batch) — [[mergeSnapshotSink]] wires it into foreachBatch,
    * and its replay-idempotence is what turns Spark's at-least-once
    * batch delivery into an effectively-exactly-once sink. */
  def mergeBatch(prev: DataFrame, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // a crawl feed routinely re-delivers the same id twice inside one
    // trigger; snapshotMerge's full-outer join would emit BOTH rows and
    // the duplicate id then lives in every later snapshot. A micro-batch
    // has no row order, so "last wins" is undefined — collapse to one
    // DETERMINISTIC survivor per id (max fingerprint; ties are
    // byte-identical texts) so failure replays rebuild identical bytes.
    val fp = coalesce(
      graft.functions.TextFunctions.fingerprint(col(textCol)),
      lit("__null_text__"))
    val one = batch.groupBy(col(idCol))
      .agg(max_by(col(textCol), fp).as(textCol))
    graft.operators.Dedup.snapshotMerge(prev, one, idCol, textCol)
      .select(idCol, textCol)
  }

  /** Exactly-once streaming snapshot maintenance: every micro-batch of
    * upserts MERGEs into a VERSIONED parquet snapshot —
    * `workDir/v=<batchId>` is rebuilt from the latest version `<
    * batchId` (or `base` for the first). A failure-replayed batch
    * (Spark's delivery is at-least-once) reads the same predecessor
    * and overwrites the same dir with identical content, so the sink
    * is idempotent; readers pin a version and never see a half-written
    * table. This is the Delta-style MERGE INTO loop expressed with
    * nothing but parquet + deterministic versioning — at 100 TB the
    * per-batch cost is one full-outer join of snapshot x delta, which
    * AQE broadcasts whenever the crawl delta is small.
    *
    * Caller starts/stops the query (e.g. `.trigger(AvailableNow)`). */
  def mergeSnapshotSink(updates: DataFrame, base: DataFrame,
      workDir: String, idCol: String, textCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    updates.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        mergeSnapshotBatch(base, workDir, idCol, textCol)(
          batch.toDF(), batchId)
    }

  /** The foreachBatch body of [[mergeSnapshotSink]], visible so specs
    * can drive a failure REPLAY directly: rebuild `v=<batchId>` from
    * the latest version strictly below it. */
  private[streaming] def mergeSnapshotBatch(base: DataFrame,
      workDir: String, idCol: String, textCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // resolve the FS from workDir itself — FileSystem.get(conf) returns
    // the DEFAULT FS and throws "Wrong FS" when workDir lives elsewhere
    // (s3a:// snapshot dir under an hdfs:// default, the deployed case)
    val wd = new org.apache.hadoop.fs.Path(workDir)
    val fs = wd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prevVersion: Option[Long] =
      if (!fs.exists(wd)) None
      else fs.listStatus(wd).iterator.map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .filter(_ < batchId)
        .maxOption
    val prev = prevVersion
      .map(v => spark.read.parquet(s"$workDir/v=$v"))
      .getOrElse(base.select(col(idCol), col(textCol)))
    mergeBatch(prev, batch, idCol, textCol)
      .write.mode("overwrite").parquet(s"$workDir/v=$batchId")
  }

  /** Streaming dedup on a key column bounded by the watermark window —
    * the streaming analogue of `Dedup.dedupExact`. Batch frames take the
    * unbounded `dropDuplicates` (Spark rejects the watermark variant in
    * batch), so one code path serves backfill and the live stream with
    * the same keep-one-row-per-key contract. */
  def dedupStream(events: DataFrame, keyCol: String,
      watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCol)
    else events.dropDuplicates(keyCol)

  /** Stateful gap-based sessionization over `KeyValueGroupedDataset`
    * custom state — the streaming counterpart of `Events.sessionize`
    * (same gap rule, same session numbering, exact money sums).
    *
    * Streaming (`emitOpen = false`): per micro-batch, each user's open
    * session lives in `GroupState`; sessions close either when a later
    * event arrives past the gap, or when the event-time watermark passes
    * `last_ts + gap` (event-time timeout) — state is bounded by one open
    * session per active user. Late events older than the open session's
    * last timestamp are folded in best-effort (they extend the current
    * session, never reopen a closed one — closed sessions are final in
    * append mode).
    *
    * Batch (`emitOpen = true`): one pass per user over the complete
    * history, emitting every session including the final open one —
    * byte-identical to `Events.sessionize` (oracle-checked as
    * `q_stream_sessionize_state`).
    *
    * Session numbering survives event-time timeouts: a closed session
    * leaves a zero-size tombstone carrying its `sessNo`, so the user's
    * next session continues the count (no duplicate `(user_id, sess_no)`
    * keys downstream). Tombstones expire after `numberingRetentionHours`
    * of event-time inactivity, so state stays bounded by the ACTIVE user
    * set, not all users ever seen; a user idle past the retention
    * restarts at `sess_no = 1` — the documented trade-off. */
  def sessionizeStateful(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      emitOpen: Boolean = false,
      numberingRetentionHours: Int = 24 * 7): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    // gap rule in floor-seconds, exactly like Events.sessionize
    // (ts.cast("long") diffs) and its ANSI oracle (epoch() diffs)
    val gapSec = gapMinutes * 60L
    val retentionSec = numberingRetentionHours * 3600L

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent],
            state: GroupState[OpenSession]) =>
          // helpers are local so the closure stays self-contained
          // (no capture of the non-serializable enclosing object)
          def usOf(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000) % 1000
          def tsOf(us: Long): java.sql.Timestamp = {
            val t = new java.sql.Timestamp(us / 1000)
            t.setNanos(((us % 1000000) * 1000).toInt)
            t
          }
          def cents(v: Double): Long = math.round(v * 100.0)
          def secOf(us: Long): Long = Math.floorDiv(us, 1000000L)
          def close(u: Long, s: OpenSession): SessionRow =
            SessionRow(u, s.sessNo, tsOf(s.startUs), tsOf(s.lastUs), s.n,
              s.sumCents / 100.0)
          // A late event may extend an old session, putting the natural
          // timeout at/behind the advanced watermark — Spark rejects
          // that, so clamp every timeout just past the watermark.
          def armTimeout(atMs: Long): Unit =
            state.setTimeoutTimestamp(
              math.max(atMs, state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0L) {
              // tombstone retention expired: forget the numbering
              state.remove()
              Iterator.empty
            } else {
              // close the open session, keep a tombstone so the user's
              // next session continues at sessNo + 1
              state.update(s.copy(n = 0L, sumCents = 0L))
              armTimeout((secOf(s.lastUs) + retentionSec) * 1000L)
              Iterator.single(close(uid, s))
            }
          } else {
            // group iterators are unordered; sessionization needs time order
            val evs = it.toArray.sortBy(e => (usOf(e.ts), e.value))
            val out = Vector.newBuilder[SessionRow]
            val prior = state.getOption
            // a tombstone contributes only its numbering watermark
            var open = prior.filter(_.n > 0L)
            val lastClosedNo = prior.filter(_.n == 0L).map(_.sessNo)
              .getOrElse(0L)
            evs.foreach { e =>
              val us = usOf(e.ts)
              open match {
                case Some(s) if secOf(us) - secOf(s.lastUs) <= gapSec =>
                  open = Some(s.copy(lastUs = math.max(s.lastUs, us),
                    n = s.n + 1, sumCents = s.sumCents + cents(e.value)))
                case Some(s) =>
                  out += close(uid, s)
                  open = Some(OpenSession(s.sessNo + 1, us, us, 1L,
                    cents(e.value)))
                case None =>
                  open = Some(OpenSession(lastClosedNo + 1L, us, us, 1L,
                    cents(e.value)))
              }
            }
            if (emitOpen) {
              open.foreach(s => out += close(uid, s))
            } else {
              open.foreach { s =>
                state.update(s)
                armTimeout((secOf(s.lastUs) + gapSec + 1) * 1000L)
              }
            }
            out.result().iterator
          }
      }
  }

  /** Stateful streaming funnel — the online form of `Events.funnel`
    * for a fixed 3-step chain: per-user state is just (t1, t2, t3,
    * lastSeen), updated in event-time order with the same
    * strictly-after-at-second-granularity rule as the batch operator.
    *
    * Because steps only ever chain FORWARD in time and each batch's
    * group is processed in ascending event time, "first qualifying
    * event wins" is a pure set-once update — state is O(1) per user,
    * never a buffer of events.
    *
    * CROSS-BATCH ORDERING CONTRACT (precise): within one micro-batch
    * events are sorted, so single-batch output is exact (the
    * `emitFinal = true` path, oracle-checked against `Events.funnel`).
    * Across batches the set-once state is order-SENSITIVE: watermarks
    * bound which events are ADMITTED, not the order they arrive in, so
    * an event that is late-but-within-watermark — delivered in a later
    * batch with a timestamp EARLIER than an already-set step — cannot
    * lower t1/t2/t3, and the streamed row may then report
    * later-than-batch step times (never earlier, and never a step the
    * user didn't take; completion level can only be under-, not
    * over-stated relative to the batch operator... specifically a
    * late earlier step-1 can unlock an earlier step-2 only in the
    * batch replay). Making this exactly order-insensitive requires
    * buffering every in-watermark step event per user (state O(events
    * in horizon), not O(1)) because a late step-1 arrival
    * retroactively changes which step-2/3 events qualify; this
    * operator deliberately trades that for O(1) state. Pipelines that
    * need exact funnels over late-heavy sources should replay the
    * settled window through `Events.funnel` (the CDC-merge pattern
    * `q_stream_merge` demonstrates).
    *
    * Streaming (`emitFinal = false`): a user's funnel row is emitted
    * when the event-time watermark passes `lastSeen + inactivityHours`
    * — funnels never self-close, so inactivity is the only sound
    * completion signal; state is bounded by the active-user set. A
    * user active AGAIN after the horizon starts a FRESH funnel journey
    * and will emit a second row for the same user_id (append mode
    * cannot retract): rows are per activity-epoch, and a consumer
    * wanting one row per user keeps the latest. Batch
    * (`emitFinal = true`): one pass, emit every user at end of group —
    * byte-identical to `Events.funnel` (oracle-checked as
    * `q_stream_funnel`). */
  def funnelStateful(events: Dataset[FunnelEvent],
      steps: Seq[String] = Seq("view", "click", "purchase"),
      emitFinal: Boolean = false,
      inactivityHours: Int = 24 * 7): Dataset[FunnelRow] = {
    require(steps.size == 3, s"fixed 3-step state shape, got $steps")
    import events.sparkSession.implicits._
    val (s1, s2, s3) = (steps(0), steps(1), steps(2))

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FunnelEvent],
            state: GroupState[FunnelProgress]) =>
          def usOf(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000) % 1000
          def secOf(us: Long): Long = Math.floorDiv(us, 1000000L)
          def row(p: FunnelProgress): FunnelRow = {
            val lvl = if (p.t3 >= 0) 3 else if (p.t2 >= 0) 2
              else if (p.t1 >= 0) 1 else 0
            FunnelRow(uid, Option(p.t1).filter(_ >= 0),
              Option(p.t2).filter(_ >= 0), Option(p.t3).filter(_ >= 0),
              lvl)
          }
          if (state.hasTimedOut) {
            val p = state.get
            state.remove()
            Iterator.single(row(p))
          } else {
            // group iterators are unordered; the set-once updates below
            // assume ascending event time within the batch
            val evs = it.toArray.sortBy(e => usOf(e.ts))
            var p = state.getOption
              .getOrElse(FunnelProgress(-1L, -1L, -1L, 0L))
            evs.foreach { e =>
              val us = usOf(e.ts)
              val es = secOf(us)
              if (e.event_type == s1 && p.t1 < 0) p = p.copy(t1 = es)
              else if (e.event_type == s2 && p.t2 < 0 && p.t1 >= 0 &&
                es > p.t1) p = p.copy(t2 = es)
              else if (e.event_type == s3 && p.t3 < 0 && p.t2 >= 0 &&
                es > p.t2) p = p.copy(t3 = es)
              p = p.copy(lastUs = math.max(p.lastUs, us))
            }
            if (emitFinal) Iterator.single(row(p))
            else {
              state.update(p)
              state.setTimeoutTimestamp(math.max(
                (secOf(p.lastUs) + inactivityHours * 3600L) * 1000L,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }

  /** Stateful streaming transition tracker — the online form of
    * `Events.transitionMatrix`'s step extraction: every observed
    * (event_type -> next event_type) step of a user's sequence is
    * emitted AS IT HAPPENS (steps are facts — no timeout needed to
    * emit), with O(1) state per user (the last event only). A later
    * batch chains its first event onto the stored last event, so steps
    * never drop at batch boundaries. Downstream aggregation into
    * counts/probabilities is ordinary streaming groupBy (or batch —
    * `emitFinal = true` path is oracle-checked equal to the batch
    * operator as `q_stream_transitions`).
    *
    * Ordering contract: within a batch events are sorted by
    * (ts, event_id) — identical to the batch operator's window sort.
    * Across batches the same watermark caveat as `funnelStateful`
    * applies: a late-but-in-watermark event delivered AFTER a newer
    * one cannot splice itself into the middle of already-emitted
    * steps (append mode cannot retract); it chains onto the stored
    * last event instead. Idle users' state is dropped after
    * `retentionHours` of event-time inactivity. */
  def transitionsStateful(events: Dataset[TransitionEvent],
      emitFinal: Boolean = false,
      retentionHours: Int = 24 * 7): Dataset[TransitionStep] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionStep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[TransitionEvent],
            state: GroupState[LastEvent]) =>
          def usOf(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000) % 1000
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = it.toArray.sortBy(e => (usOf(e.ts), e.event_id))
            val out = Vector.newBuilder[TransitionStep]
            var last = state.getOption
            evs.foreach { e =>
              last.foreach(l =>
                out += TransitionStep(l.lastType, e.event_type))
              last = Some(LastEvent(usOf(e.ts), e.event_id, e.event_type))
            }
            if (!emitFinal) {
              last.foreach { l =>
                state.update(l)
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(l.lastUs, 1000L) +
                    retentionHours * 3600L * 1000L,
                  state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
  }

  /** Streaming windowed TOP-K event types — "what dominated each
    * hour", emitted as FINAL per-window leaderboards (append mode
    * cannot retract a provisional ranking, so ranking on state close
    * is the only sound emission point; plain windowed counts can't
    * rank at all in append streaming — rank-after-aggregate needs a
    * second stateful stage, which is exactly what this operator is).
    *
    * State per tumbling window: the (event_type -> count) map —
    * bounded by the type vocabulary, never the event volume. The
    * leaderboard (top `k` by count desc, type asc — deterministic)
    * emits when the event-time watermark passes the window end.
    *
    * Batch (`emitFinal = true`): one pass per window group, emit at
    * end of group — identical to the windowed-count + rank oracle
    * (`q_stream_topk`). */
  def topKStateful(events: Dataset[TopKEvent], windowMinutes: Int = 60,
      k: Int = 3, emitFinal: Boolean = false): Dataset[TopKRow] = {
    require(windowMinutes >= 1, s"bad windowMinutes: $windowMinutes")
    require(k >= 1, s"bad k: $k")
    import events.sparkSession.implicits._
    val winSec = windowMinutes * 60L

    def topOf(ws: Long, m: Map[String, Long]): Iterator[TopKRow] =
      m.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
        .map { case ((t, n), i) => TopKRow(ws, t, n, i + 1) }.iterator

    events.groupByKey(e =>
        Math.floorDiv(e.ts.getTime / 1000L, winSec) * winSec)
      .flatMapGroupsWithState[WindowCounts, TopKRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ws: Long, it: Iterator[TopKEvent],
            state: GroupState[WindowCounts]) =>
          if (state.hasTimedOut) {
            val m = state.get.counts
            state.remove()
            topOf(ws, m)
          } else {
            var m = state.getOption.map(_.counts)
              .getOrElse(Map.empty[String, Long])
            it.foreach { e =>
              m = m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
            }
            if (emitFinal) topOf(ws, m)
            else {
              state.update(WindowCounts(m))
              // close when the watermark passes the window END (never
              // in the past relative to the current watermark)
              state.setTimeoutTimestamp(math.max(
                (ws + winSec) * 1000L, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }

  /** PREQUENTIAL streaming anomaly detector per key: every event is
    * scored against the running mean/stddev of the events STRICTLY
    * BEFORE it (Welford recursion in `GroupState` — O(1) per key), so
    * each flag was made with information available at that moment
    * (score-then-update; a batch z-score that includes the point in
    * its own baseline both dilutes and double-counts the outlier, and
    * cannot stream). `z = (x - mean)/sqrt(m2/(n-1))` with the sample
    * stddev; no flag before `minN` prior points; zero-variance
    * baselines never divide (z = None unless the value deviates from
    * the constant baseline by more than [[ZeroVarEps]], then
    * infinite-z is reported as anomaly with z = None).
    *
    * Batch mode runs the IDENTICAL fold over each key's full history
    * in one group call (the funnelStateful discipline: batch ==
    * stream byte for byte), and the SQL oracle replays the recursion
    * as window aggregates over the strictly-prior frame. State is one
    * (n, mean, m2) triple per ACTIVE key — event-time retention like
    * [[transitionsStateful]].
    *
    * SCALE CONTRACT (ENFORCED): streaming state is O(keys), but BATCH
    * mode holds one key's full history per task (the
    * flatMapGroupsWithState shape every stateful sibling shares) — so
    * the key's cardinality is both the parallelism and the per-task
    * memory bound. Per-user / per-source keys scale with the corpus;
    * a LOW-cardinality key (e.g. a handful of event types) over a
    * 100 TB backfill must run the window-aggregate formulation
    * instead (exactly the oracle's SQL — AVG/STDDEV_SAMP over `ROWS
    * BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`, one shuffle, no
    * per-key materialization). Batch mode measures rows-per-key with
    * one aggregate pass and fails fast above
    * [[MaxBatchHistoryPerKey]] with that fix in the message. */
  val MaxBatchHistoryPerKey: Long = 2000000L
  /** Zero-variance-arm tolerance: wide enough to absorb last-ulp
    * disagreement between an exact Welford mean and a sum/n mean,
    * narrow enough that any real deviation on O(1)-scaled values
    * still flags. Mirrored literally in the `q_stream_anomaly`
    * oracle SQL. */
  val ZeroVarEps: Double = 1e-9

  def anomalyStateful(events: Dataset[AnomalyEvent], minN: Int = 5,
      zThreshold: Double = 3.0, retentionHours: Int = 24 * 7,
      retainState: Boolean = true,
      maxBatchHistoryPerKey: Long = MaxBatchHistoryPerKey)
      : Dataset[AnomalyRow] = {
    require(minN >= 2, s"minN must be >= 2 (sample stddev): $minN")
    require(maxBatchHistoryPerKey >= 1,
      s"bad maxBatchHistoryPerKey: $maxBatchHistoryPerKey")
    import events.sparkSession.implicits._
    if (!retainState) {
      // batch backfill: one pass measures average per-key history
      // BEFORE any key's history is materialized in a single task
      val r = events.toDF().agg(count(lit(1)),
        approx_count_distinct(col("key"))).head
      val n = r.getLong(0)
      val k = math.max(1L, r.getLong(1))
      require(n / k <= maxBatchHistoryPerKey,
        s"anomalyStateful batch mode: ~${n / k} rows per key across " +
          s"$k key(s) (> maxBatchHistoryPerKey=$maxBatchHistoryPerKey)" +
          " — one task would hold that whole history; use the " +
          "window-aggregate formulation instead (AVG/STDDEV_SAMP " +
          "OVER (PARTITION BY key ORDER BY ts, event_id ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND 1 PRECEDING))")
    }
    events.groupByKey(_.key)
      .flatMapGroupsWithState[WelfordState, AnomalyRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[AnomalyEvent],
            state: GroupState[WelfordState]) =>
          def usOf(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000) % 1000
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = it.toArray.sortBy(e => (usOf(e.ts), e.event_id))
            var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0, 0L))
            val out = evs.map { e =>
              val (z, flag) =
                if (st.n < minN) (None, false)
                else {
                  val sd = math.sqrt(st.m2 / (st.n - 1))
                  if (sd > 0)
                    Some(BigDecimal((e.value - st.mean) / sd).setScale(6,
                      BigDecimal.RoundingMode.HALF_UP).toDouble)
                      .map(zz => (Some(zz), math.abs(zz) > zThreshold)).get
                  // tolerance, not exact inequality: the oracle's AVG
                  // (sum/n) can differ from the Welford mean in the
                  // last ulp for a constant history (e.g. five 0.1s),
                  // so both sides gate on |value - mean| > 1e-9
                  else (None, math.abs(e.value - st.mean) > ZeroVarEps)
                }
              val n1 = st.n + 1
              val d = e.value - st.mean
              val mean1 = st.mean + d / n1
              st = WelfordState(n1, mean1,
                st.m2 + d * (e.value - mean1), usOf(e.ts))
              AnomalyRow(key, e.ts, e.event_id, e.value, z, flag)
            }
            // batch mode (retainState = false): each key's history is
            // one group call, so persisting state/timeouts is not just
            // unnecessary — batch execution has no watermark to time
            // out against (the emitFinal discipline of the siblings)
            if (retainState) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(st.lastUs, 1000L) +
                  retentionHours * 3600L * 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming CDC changelog compaction — the stateful twin of
    * [[graft.operators.Dedup.changelogCompact]]: per key, maintain
    * (first op, last op, count, last value) over the I/U/D stream and
    * emit the net change. Unlike every score-then-update sibling, this
    * state is an ORDER-INSENSITIVE monoid — first/last are resolved by
    * comparing the log offset `seq`, so out-of-order and cross-batch
    * arrival cannot change the result (no per-batch sort needed, and
    * batch mode equals the batch operator by construction; pinned in
    * Wave16Spec). Streaming emits the running net per key each batch
    * (Update-style compaction feed); batch mode (`retainState=false`)
    * emits once per key. State is O(keys) — a handful of scalars. */
  def changelogStateful(events: Dataset[ChangeEvent],
      retainState: Boolean = true, retentionHours: Int = 24 * 7)
      : Dataset[NetChangeRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CompactState, NetChangeRow](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, it: Iterator[ChangeEvent],
            state: GroupState[CompactState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              CompactState(0L, Long.MaxValue, "", Long.MinValue, "", 0.0))
            it.foreach { e =>
              val firstOp =
                if (e.seq < st.firstSeq) e.op else st.firstOp
              val firstSeq = math.min(e.seq, st.firstSeq)
              val (lastOp, lastVal) =
                if (e.seq > st.lastSeq) (e.op, e.value)
                else (st.lastOp, st.lastVal)
              st = CompactState(st.n + 1, firstSeq, firstOp,
                math.max(e.seq, st.lastSeq), lastOp, lastVal)
            }
            if (retainState) {
              state.update(st)
              state.setTimeoutDuration(s"$retentionHours hours")
            }
            if (st.n == 0L) Iterator.empty
            else {
              val net =
                if (st.lastOp == "D") { if (st.firstOp == "I") "N" else "D" }
                else { if (st.firstOp == "I") "I" else "U" }
              Iterator.single(NetChangeRow(key, st.n, st.firstOp,
                st.lastOp, net, st.lastVal, st.firstSeq, st.lastSeq))
            }
          }
      }
  }

  /** Streaming FIRST-SEEN filter — emits each key exactly once, with
    * the earliest day it was observed: the stateful primitive behind
    * a live novelty curve (aggregate the emissions per day and join
    * the day totals; `q_stream_novelty` does exactly that and shares
    * `q_novelty`'s oracle). State per key is one long (the first
    * day); an update emits only when a batch IMPROVES the known
    * minimum, so replays/late data can tighten but never duplicate a
    * day's credit downstream (consumers treat emissions as upserts
    * keyed by `k`; in batch emit-final mode each key emits exactly
    * once, the min).
    *
    * State is O(distinct keys) — the same class as [[dedupStream]],
    * and like it the operator is for keyed novelty tracking, not
    * unbounded-cardinality payloads. For key spaces that DO grow
    * forever (URLs, doc hashes), opt into `retentionHours > 0`: idle
    * keys are dropped after that much processing time, bounding state
    * at O(keys active within the retention window) — the
    * [[changelogStateful]] retention contract. The cost is precise:
    * a key re-seen after expiry re-emits with its post-expiry minimum
    * day, so with retention on, downstream consumers must MIN-merge
    * emissions per key (the true first emission already happened
    * before expiry, so min-merge stays exact); with the default
    * `retentionHours = 0` each key emits improving minima only and
    * plain upsert-by-key is sound. */
  def firstSeenStateful(events: Dataset[NoveltyEvent],
      emitFinal: Boolean = false,
      retentionHours: Int = 0): Dataset[FirstSeenRow] = {
    import events.sparkSession.implicits._
    require(retentionHours >= 0, s"bad retentionHours: $retentionHours")
    val timeoutConf =
      if (retentionHours > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.k)
      .flatMapGroupsWithState[Long, FirstSeenRow](
        OutputMode.Append, timeoutConf) {
        (k: String, it: Iterator[NoveltyEvent],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def arm(): Unit =
              if (retentionHours > 0 && !emitFinal)
                state.setTimeoutDuration(s"$retentionHours hours")
            val batchMin = it.map(_.day).min
            state.getOption match {
              case Some(prev) if prev <= batchMin =>
                arm(); Iterator.empty
              case _ =>
                if (!emitFinal) { state.update(batchMin); arm() }
                Iterator.single(FirstSeenRow(k, batchMin))
            }
          }
      }
  }

  /** Streaming table fingerprint — the XOR-fold of
    * [[graft.operators.Profile.tableFingerprint]] run as per-group
    * state: `(count, xor)` is a commutative monoid, so the stream
    * accumulates in ANY arrival order and the batch emit-final run is
    * byte-identical to the batch aggregate (q_stream_fingerprint's
    * oracle is the fingerprint SQL minus the distinct-row count,
    * which would need per-row state a stream must not hold). State is
    * O(groups): two longs per group. */
  def fingerprintStateful(rows: Dataset[FpEvent],
      emitFinal: Boolean = false): Dataset[FpRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.group)
      .flatMapGroupsWithState[FpState, FpRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[FpEvent], state: GroupState[FpState]) =>
          var st = state.getOption.getOrElse(FpState(0L, 0L))
          it.foreach(e => st = FpState(st.n + 1L, st.x ^ e.h))
          if (emitFinal) Iterator.single(FpRow(g, st.n, st.x))
          else {
            state.update(st)
            // running snapshot per batch: consumers upsert by group
            Iterator.single(FpRow(g, st.n, st.x))
          }
      }
  }
}
