package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.multimodal.Multimodal

final case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingOpsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates a real stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.windowedCounts(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      mem.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:55:00"), "click", 2.0),
        Ev(ts("2026-01-01 11:10:00"), "buy", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select(col("win").cast("string"), col("event_type"), col("cnt"),
          col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      rows should contain(("2026-01-01 10:00:00", "click", 2L, 3.0))
      rows should contain(("2026-01-01 11:00:00", "buy", 1L, 4.0))
    } finally q.stop()
  }

  test("windowedCounts runs unchanged on a batch frame") {
    val batch = Seq(Ev(ts("2026-01-01 10:05:00"), "click", 1.0)).toDF()
    StreamingOps.windowedCounts(batch).count() shouldBe 1L
  }

  test("sessionizeStateful closes sessions across micro-batches on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val src = mem.toDF().withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val q = StreamingOps.sessionizeStateful(src, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessstate")
      .outputMode("append").start()
    try {
      // batch 1: two events of user 7 in one session, one of user 9
      mem.addData(
        SessionEvent(7L, ts("2026-01-01 10:00:00"), 1.0),
        SessionEvent(7L, ts("2026-01-01 10:10:00"), 2.0),
        SessionEvent(9L, ts("2026-01-01 10:05:00"), 16.0))
      q.processAllAvailable()
      // nothing closed yet: sessions are still open
      spark.table("sessstate").count() shouldBe 0L
      // batch 2: user 7 comes back past the gap -> session 1 closes
      // inline; the watermark jump also times out user 9's session
      mem.addData(SessionEvent(7L, ts("2026-01-01 12:00:00"), 8.0))
      q.processAllAvailable()
      // one more empty batch so the timeout (watermark from batch 2)
      // fires for user 9
      mem.addData(SessionEvent(5L, ts("2026-01-01 12:00:01"), 0.5))
      q.processAllAvailable()
      val rows = spark.table("sessstate")
        .select("user_id", "sess_no", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      rows should contain((7L, 1L, 2L, 3.0))
      rows should contain((9L, 1L, 1L, 16.0))
    } finally q.stop()
  }

  test("sessionizeStateful in batch mode equals the window formulation") {
    val ev = Seq(
      SessionEvent(7L, ts("2026-01-01 10:05:00"), 1.0),
      SessionEvent(7L, ts("2026-01-01 10:25:00"), 2.0),
      SessionEvent(7L, ts("2026-01-01 10:50:00"), 4.0),
      SessionEvent(7L, ts("2026-01-01 13:00:00"), 8.0),
      SessionEvent(9L, ts("2026-01-01 10:10:00"), 16.0)).toDS()
    val stateful = StreamingOps.sessionizeStateful(ev, 30, emitOpen = true)
      .collect().map(r =>
        (r.user_id, r.sess_no, r.sess_start.toString, r.sess_end.toString,
          r.n_events, r.sum_value)).toSet
    val window = graft.operators.Events.sessionize(
        ev.toDF().withColumn("event_type", lit("x")), 30)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
          r.getTimestamp(3).toString, r.getLong(4), r.getDouble(5))).toSet
    stateful shouldBe window
  }

  test("dedupStream drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(mem.toDF(), "event_type")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(ts("2026-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2026-01-01 10:06:00"), "click", 2.0),
        Ev(ts("2026-01-01 10:07:00"), "buy", 3.0))
      q.processAllAvailable()
      spark.table("dedupstream").count() shouldBe 2L
    } finally q.stop()
  }
}

class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "fake-jpeg-bytes-here"),
    (2L, "audio", "fake-wav-bytes"),
    (3L, "video", "fake-mp4-bytes")
  ).toDF("media_id", "kind", "payload")
    .select(col("media_id"), col("kind"), col("payload").cast("binary").as("bytes"),
      map(lit("k"), lit("v")).as("meta"))

  test("decodeFeatures emits the typed feature schema, deterministically") {
    val f1 = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val f2 = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    f1.keySet shouldBe Set(1L, 2L, 3L)
    f1(1L).getInt(2) shouldBe "fake-jpeg-bytes-here".length // n_bytes
    f1(2L).getInt(5) shouldBe 1 // audio => 1 channel
    // deterministic across runs
    f1(3L).toSeq shouldBe f2(3L).toSeq
    Multimodal.decodeFeatures(media).schema shouldBe Multimodal.featureSchema
  }

  test("frameSamplePlan fans out every Nth frame for videos only") {
    val frames = Multimodal.frameSamplePlan(media, totalFrames = 10, everyNth = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    frames.map(_._1).toSet shouldBe Set(3L)
    frames.map(_._2).sorted shouldBe Array(0, 3, 6, 9)
  }
}
