package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Prequential streaming anomaly detector. */
class AnomalySpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(k: String, t: String, id: Long, v: Double) =
    AnomalyEvent(k, ts(t), id, v)

  test("prequential scoring: baseline excludes the scored point") {
    // 6 calm points ~10, then a spike: z against the CALM baseline
    val evs = (1 to 6).map(i =>
      ev("a", f"2026-01-01 10:0$i:00", i, 10.0 + (i % 2))) :+
      ev("a", "2026-01-01 10:07:00", 7, 100.0)
    val out = StreamingOps.anomalyStateful(evs.toDS(), minN = 5,
        retainState = false)
      .collect().sortBy(_.event_id)
    out.take(5).foreach { r => r.anomaly shouldBe false; r.z shouldBe None }
    out(5).z should not be None // 6th point: baseline of 5
    out(6).anomaly shouldBe true
    out(6).z.get should be > 50.0
    // the spike must NOT dilute its own baseline: recompute by hand
    val base = evs.take(6).map(_.value)
    val m = base.sum / 6
    val sd = math.sqrt(base.map(v => (v - m) * (v - m)).sum / 5)
    out(6).z.get shouldBe BigDecimal((100.0 - m) / sd).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("zero-variance baseline: deviation flags without a z value") {
    val evs = (1 to 6).map(i =>
      ev("a", f"2026-01-01 10:0$i:00", i, 5.0)) :+
      ev("a", "2026-01-01 10:07:00", 7, 6.0)
    val out = StreamingOps.anomalyStateful(evs.toDS(), minN = 5,
        retainState = false)
      .collect().sortBy(_.event_id)
    out(5).anomaly shouldBe false // equals the constant baseline
    out(6).anomaly shouldBe true  // deviates from zero-variance history
    out(6).z shouldBe None
  }

  test("streaming: Welford state carries the baseline across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AnomalyEvent]
    val q = StreamingOps.anomalyStateful(
        mem.toDS().withWatermark("ts", "0 seconds"), minN = 5)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      mem.addData((1 to 6).map(i =>
        ev("a", f"2026-01-01 10:0$i:00", i, 10.0 + (i % 2))): _*)
      q.processAllAvailable()
      mem.addData(ev("a", "2026-01-01 10:07:00", 7, 100.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM anom_out").as[AnomalyRow]
        .collect().map(r => r.event_id -> r).toMap
      rows(7L).anomaly shouldBe true // scored against batch-1's state
      // byte-identical to the one-shot batch fold
      val batch = StreamingOps.anomalyStateful(
        ((1 to 6).map(i =>
          ev("a", f"2026-01-01 10:0$i:00", i, 10.0 + (i % 2))) :+
          ev("a", "2026-01-01 10:07:00", 7, 100.0)).toDS(),
        minN = 5, retainState = false)
        .collect().map(r => r.event_id -> r).toMap
      rows.view.mapValues(r => (r.z, r.anomaly)).toMap shouldBe
        batch.view.mapValues(r => (r.z, r.anomaly)).toMap
    } finally q.stop()
  }
}
