package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class StreamingFunnelSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnelStateful chains across micro-batches and emits on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val src = mem.toDF().withWatermark("ts", "0 seconds").as[FunnelEvent]
    val q = StreamingOps.funnelStateful(src, inactivityHours = 1)
      .writeStream.format("memory").queryName("funnelstate")
      .outputMode("append").start()
    try {
      // batch 1: view only — nothing emitted, state open
      mem.addData(FunnelEvent(7L, ts("2026-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      spark.table("funnelstate").count() shouldBe 0L
      // batch 2: click in a LATER batch must chain onto batch-1 state
      mem.addData(FunnelEvent(7L, ts("2026-01-01 10:05:00"), "click"))
      q.processAllAvailable()
      // batch 3+4: watermark jumps past user 7's inactivity horizon ->
      // its funnel row emits with level 2
      mem.addData(FunnelEvent(9L, ts("2026-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      mem.addData(FunnelEvent(9L, ts("2026-01-01 12:00:01"), "view"))
      q.processAllAvailable()
      val rows = spark.table("funnelstate")
        .collect().map(r => (r.getLong(0), r.getInt(4))).toMap
      rows shouldBe Map(7L -> 2)
    } finally q.stop()
  }

  test("funnelStateful batch mode equals Events.funnel on real-shaped data") {
    val ev = Seq(
      FunnelEvent(1L, ts("2026-01-01 10:00:00"), "view"),
      FunnelEvent(1L, ts("2026-01-01 10:00:10"), "click"),
      FunnelEvent(1L, ts("2026-01-01 10:00:20"), "purchase"),
      FunnelEvent(2L, ts("2026-01-01 10:00:00"), "click"), // pre-view click
      FunnelEvent(2L, ts("2026-01-01 10:01:00"), "view"),
      FunnelEvent(2L, ts("2026-01-01 10:02:00"), "click"),
      FunnelEvent(3L, ts("2026-01-01 10:00:00"), "error"),
      FunnelEvent(4L, ts("2026-01-01 10:00:00"), "view"),
      FunnelEvent(4L, ts("2026-01-01 10:00:00"), "click") // same second
    ).toDS()
    val stateful = StreamingOps.funnelStateful(ev, emitFinal = true)
      .collect().map(r => (r.user_id, r.t1, r.t2, r.t3, r.level)).toSet
    val batch = graft.operators.Events.funnel(ev.toDF()).collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), opt(1), opt(2), opt(3), r.getInt(4))
      }.toSet
    stateful shouldBe batch
    batch.map(t => t._1 -> t._5).toMap shouldBe
      Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 1)
  }

  test("transitionsStateful: steps chain across micro-batches, emitted as they happen") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TransitionEvent]
    val q = StreamingOps.transitionsStateful(
        mem.toDF().withWatermark("ts", "0 seconds").as[TransitionEvent])
      .writeStream.format("memory").queryName("trans_state")
      .outputMode("append").start()
    try {
      mem.addData(
        TransitionEvent(1L, ts("2026-01-01 10:00:00"), 1L, "view"),
        TransitionEvent(1L, ts("2026-01-01 10:01:00"), 2L, "click"))
      q.processAllAvailable()
      // in-batch step emitted immediately
      spark.table("trans_state").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
        Seq(("view", "click"))
      // the next batch's first event chains onto the STORED last event
      mem.addData(
        TransitionEvent(1L, ts("2026-01-01 10:02:00"), 3L, "purchase"))
      q.processAllAvailable()
      spark.table("trans_state").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet shouldBe
        Set(("view", "click"), ("click", "purchase"))
    } finally q.stop()
  }

  test("transitionsStateful batch mode equals the batch lead-window steps") {
    val ev = Seq(
      TransitionEvent(1L, ts("2026-01-01 10:00:00"), 1L, "view"),
      TransitionEvent(1L, ts("2026-01-01 10:00:00"), 2L, "click"), // tie: id order
      TransitionEvent(1L, ts("2026-01-01 10:01:00"), 3L, "view"),
      TransitionEvent(2L, ts("2026-01-01 10:00:00"), 4L, "view") // no step
    ).toDS()
    val steps = StreamingOps.transitionsStateful(ev, emitFinal = true)
      .collect().map(s => (s.event_type, s.next_type))
      .groupBy(identity).view.mapValues(_.length).toMap
    steps shouldBe Map(("view", "click") -> 1, ("click", "view") -> 1)
  }

  test("transitionMatrix: counts and row-normalized probabilities") {
    val df = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2026-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2026-01-01 10:02:00"), "view"),
      (4L, 1L, ts("2026-01-01 10:03:00"), "click"),
      (5L, 2L, ts("2026-01-01 10:00:00"), "view"),
      (6L, 2L, ts("2026-01-01 10:01:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Events.transitionMatrix(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    out shouldBe Map(
      ("view", "click") -> (2L, 0.666667),
      ("view", "purchase") -> (1L, 0.333333),
      ("click", "view") -> (1L, 1.0))
  }

  test("transitionMatrix: never crosses user boundaries") {
    val df = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view"),
      (2L, 2L, ts("2026-01-01 10:01:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    graft.operators.Events.transitionMatrix(df).count() shouldBe 0L
  }
}
