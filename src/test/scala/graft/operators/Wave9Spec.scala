package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.streaming.{StreamingOps, TopKEvent}

/** Round-8 wave 9: sorted-neighborhood linkage, Luhn validation,
  * stateful windowed top-k. */
class Wave9Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("sortedNeighborPairs: window pairs survive SHARD boundaries") {
    // "azzz" and "baaa" sit in different leading-char shards but are
    // rank-adjacent — the global-rank band join must still pair them
    // (a per-shard window would lose exactly these); every rank-1
    // neighbor within dist 4 pairs
    val df = Seq("azza", "azzz", "baaa", "zzzz").toDF("nm")
    val out = Linkage.sortedNeighborPairs(df, "nm", window = 1,
        maxDist = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    out shouldBe Set(("azza", "azzz"), ("azzz", "baaa"),
      ("baaa", "zzzz"))
  }

  test("sortedNeighborPairs: window bounds candidates; dist filters") {
    val df = Seq("aaa", "aab", "aac", "aad", "xyz").toDF("nm")
    // window=3: aaa pairs with aab/aac/aad (dist 1 each); nothing
    // reaches xyz within dist 2
    val out = Linkage.sortedNeighborPairs(df, "nm", window = 3,
        maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    out.keySet shouldBe Set(("aaa", "aab"), ("aaa", "aac"),
      ("aaa", "aad"), ("aab", "aac"), ("aab", "aad"), ("aac", "aad"))
    out(("aaa", "aad")) shouldBe ((3L, 1L))
  }

  test("luhnValid / luhnCheckDigit: textbook card numbers") {
    val df = Seq(
      ("4539578763621486", true), // valid Visa test number
      ("4539578763621487", false),
      ("79927398713", true), // the classic Luhn example
      ("79927398710", false))
      .toDF("cand", "expected")
    val got = df.select(col("cand"), col("expected"),
        TextFunctions.luhnValid(col("cand")).as("v"))
      .collect()
    got.foreach(r => r.getBoolean(2) shouldBe r.getBoolean(1))
    // check digit completes the body to a valid number, for any body
    val bodies = Seq("453957876362148", "7992739871", "000000000000",
      "123456789012")
    val cd = bodies.toDF("body")
      .select(col("body"),
        TextFunctions.luhnCheckDigit(col("body")).as("d"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    cd("7992739871") shouldBe 3 // 79927398713 is valid
    bodies.foreach { b =>
      val full = b + cd(b).toString
      Seq(full).toDF("c")
        .select(TextFunctions.luhnValid(col("c")))
        .head.getBoolean(0) shouldBe true
    }
  }

  test("pqCodes: per-subspace codes bounded by k, partition-invariant") {
    val rng = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(df, "vec_id", "embedding",
        m = 4, k = 3, iters = 2, dim = 16)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(r.getLong(_))).toMap
    out.size shouldBe 40
    out.values.foreach(cs => all(cs) should (be >= 0L and be < 3L))
    // determinism under repartitioning (centroid init is by vec_id,
    // every fold is sorted — partitioning must not matter)
    val out2 = Similarity.pqCodes(df.repartition(7), "vec_id",
        "embedding", m = 4, k = 3, iters = 2, dim = 16)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(r.getLong(_))).toMap
    out2 shouldBe out
    Dedup.releaseCaches()
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("topKStateful batch mode == windowed counts + rank") {
    val ev = Seq(
      ("2026-01-01 10:05:00", "view"), ("2026-01-01 10:10:00", "view"),
      ("2026-01-01 10:15:00", "click"), ("2026-01-01 10:20:00", "view"),
      ("2026-01-01 10:25:00", "error"), ("2026-01-01 10:30:00", "click"),
      ("2026-01-01 10:35:00", "buy"),
      ("2026-01-01 11:05:00", "buy"), ("2026-01-01 11:10:00", "buy"))
      .map { case (t, e) => TopKEvent(ts(t), e) }
    val out = StreamingOps.topKStateful(ev.toDS(), windowMinutes = 60,
        k = 2, emitFinal = true)
      .collect().map(r => (r.window_start, r.rank) -> (r.event_type, r.n))
      .toMap
    val w10 = ts("2026-01-01 10:00:00").getTime / 1000
    val w11 = w10 + 3600
    out((w10, 1)) shouldBe (("view", 3L))
    out((w10, 2)) shouldBe (("click", 2L))
    out((w11, 1)) shouldBe (("buy", 2L))
    out.size shouldBe 3 // k bounds each window's leaderboard
  }

  test("topKStateful: deterministic tie-break (count desc, type asc)") {
    val ev = Seq("b", "a", "c", "a", "b", "c")
      .zipWithIndex.map { case (e, i) =>
        TopKEvent(ts(f"2026-01-01 10:0$i:00"), e) }
    val out = StreamingOps.topKStateful(ev.toDS(), windowMinutes = 60,
        k = 3, emitFinal = true)
      .collect().sortBy(_.rank).map(r => (r.event_type, r.rank))
    out shouldBe Array(("a", 1), ("b", 2), ("c", 3))
  }

  test("topKStateful streaming: leaderboard emits when the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TopKEvent]
    val q = StreamingOps.topKStateful(
        mem.toDS().withWatermark("ts", "0 seconds"),
        windowMinutes = 60, k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      mem.addData(
        TopKEvent(ts("2026-01-01 10:05:00"), "view"),
        TopKEvent(ts("2026-01-01 10:10:00"), "view"),
        TopKEvent(ts("2026-01-01 10:15:00"), "click"))
      q.processAllAvailable()
      // window 10:00 still open (watermark at 10:15)
      spark.sql("SELECT * FROM topk_out").count() shouldBe 0L
      // an 11:30 event pushes the watermark past 11:00 -> closes 10:00
      mem.addData(TopKEvent(ts("2026-01-01 11:30:00"), "buy"))
      q.processAllAvailable()
      mem.addData(TopKEvent(ts("2026-01-01 11:31:00"), "buy"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM topk_out")
        .collect().map(r => (r.getLong(0), r.getInt(3)) ->
          (r.getString(1), r.getLong(2))).toMap
      val w10 = ts("2026-01-01 10:00:00").getTime / 1000
      rows((w10, 1)) shouldBe (("view", 2L))
      rows((w10, 2)) shouldBe (("click", 1L))
    } finally q.stop()
  }
}
