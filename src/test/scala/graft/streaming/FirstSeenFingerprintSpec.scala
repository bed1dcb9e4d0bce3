package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-31 streaming twins: the first-seen filter and the
  * XOR fingerprint monoid. */
class FirstSeenFingerprintSpec extends AnyFunSuite with Matchers
    with SparkSpec {
  import spark.implicits._

  test("firstSeenStateful batch: each key once, at its min day") {
    val evs = Seq(NoveltyEvent("a", 5L), NoveltyEvent("a", 2L),
      NoveltyEvent("b", 7L), NoveltyEvent("a", 9L))
    val out = StreamingOps.firstSeenStateful(evs.toDS(),
      emitFinal = true).collect().sortBy(_.k)
    out.map(r => (r.k, r.day)).toSeq shouldBe Seq(("a", 2L), ("b", 7L))
  }

  test("firstSeenStateful streaming: emits once, re-emits only on an " +
    "improved minimum") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[NoveltyEvent]
    val q = StreamingOps.firstSeenStateful(mem.toDS())
      .writeStream.format("memory").queryName("fs_out")
      .outputMode("append").start()
    try {
      mem.addData(NoveltyEvent("a", 5L), NoveltyEvent("b", 3L))
      q.processAllAvailable()
      // a repeat and a LATER sighting stay silent; an EARLIER one
      // upserts
      mem.addData(NoveltyEvent("a", 9L), NoveltyEvent("b", 3L),
        NoveltyEvent("a", 1L))
      q.processAllAvailable()
      val rows = spark.table("fs_out").as[FirstSeenRow].collect()
      rows.count(_.k == "b") shouldBe 1
      rows.filter(_.k == "a").map(_.day).sorted.toSeq shouldBe
        Seq(1L, 5L) // initial emission + the improving upsert
    } finally q.stop()
  }

  test("firstSeenStateful with retention: batch results unchanged " +
    "(the timeout only bounds streaming state, never the answer " +
    "within a window)") {
    // NOTE deliberately batch-mode: a streaming ProcessingTimeTimeout
    // query never settles under processAllAvailable (the engine keeps
    // scheduling timeout-check batches), so like changelogStateful the
    // retention path is pinned via the batch twin + the documented
    // MIN-merge consumer contract
    val evs = Seq(NoveltyEvent("a", 5L), NoveltyEvent("a", 2L),
      NoveltyEvent("b", 7L))
    val out = StreamingOps.firstSeenStateful(evs.toDS(),
      emitFinal = true, retentionHours = 24).collect().sortBy(_.k)
    out.map(r => (r.k, r.day)).toSeq shouldBe Seq(("a", 2L), ("b", 7L))
  }

  test("firstSeenStateful rejects a negative retention") {
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.firstSeenStateful(
        Seq(NoveltyEvent("a", 1L)).toDS(), retentionHours = -1)
  }

  test("fingerprintStateful: any arrival order, same (n, xor)") {
    val rows = Seq(FpEvent("g", 3L), FpEvent("g", 12L),
      FpEvent("g", 7L), FpEvent("h", 5L))
    val a = StreamingOps.fingerprintStateful(rows.toDS(),
      emitFinal = true).collect().sortBy(_.group)
    val b = StreamingOps.fingerprintStateful(rows.reverse.toDS(),
      emitFinal = true).collect().sortBy(_.group)
    a.toSeq shouldBe b.toSeq
    a.find(_.group == "g").get.n_rows shouldBe 3L
    a.find(_.group == "g").get.xor_fingerprint shouldBe (3L ^ 12L ^ 7L)
  }

  test("fingerprintStateful streaming: state accumulates across " +
    "batches to the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FpEvent]
    val q = StreamingOps.fingerprintStateful(mem.toDS())
      .writeStream.format("memory").queryName("fp_out")
      .outputMode("append").start()
    try {
      mem.addData(FpEvent("g", 3L), FpEvent("g", 12L))
      q.processAllAvailable()
      mem.addData(FpEvent("g", 7L))
      q.processAllAvailable()
      val last = spark.table("fp_out").as[FpRow].collect()
        .filter(_.group == "g").maxBy(_.n_rows)
      last.n_rows shouldBe 3L
      last.xor_fingerprint shouldBe (3L ^ 12L ^ 7L)
    } finally q.stop()
  }
}
