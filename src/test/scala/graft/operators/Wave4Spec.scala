package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-7 wave 4: weighted median, CUSUM drift, nearest-event join,
  * image dHash. */
class Wave4Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("weightedMedian: weight mass decides, not row count") {
    // values 1..4; the weight sits on 4 -> weighted median 4 (the
    // unweighted median would be 2)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 10L)).toDF("g", "v", "w")
    val r = Stats.weightedMedian(df, "g", "v", "w").collect().head
    r.getAs[Long]("wmedian") shouldBe 4L
    r.getAs[Double]("total_weight") shouldBe 13.0
  }

  test("weightedMedian: fractional weights are accumulated, not truncated") {
    // every weight < 1 would truncate to 0 under an integer cast; the
    // mass sits on value 7 -> weighted median 7, total 1.2
    val df = Seq(("g", 1L, 0.2), ("g", 2L, 0.2), ("g", 7L, 0.8))
      .toDF("g", "v", "w")
    val r = Stats.weightedMedian(df, "g", "v", "w").collect().head
    r.getAs[Long]("wmedian") shouldBe 7L
    r.getAs[Double]("total_weight") shouldBe 1.2 +- 1e-9
  }

  test("weightedMedian: value ties accumulate together; zero weights excluded") {
    // cum at value 2 = 3+3 = 6 >= 10/2 -> median 2 regardless of the
    // intra-tie row order; the w=0 row must not count
    val df = Seq(("g", 1L, 4L), ("g", 2L, 3L), ("g", 2L, 3L),
      ("g", 9L, 0L)).toDF("g", "v", "w")
    val r = Stats.weightedMedian(df, "g", "v", "w").collect().head
    r.getAs[Long]("wmedian") shouldBe 2L
    r.getAs[Double]("total_weight") shouldBe 10.0
  }

  test("cusumShift: non-integral series centers on the true double mean") {
    // means like 1.25 would truncate to 1 under an integer-cast sum;
    // replay the recursion with the exact double mean and match
    val xs = Seq(1.0, 1.5, 1.25, 1.25, 4.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "t", "x")
    val got = Stats.cusumShift(df, "g", "t", "x", slack = 0.0,
        threshold = 1.0).collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("cusum")).toMap
    val n = xs.length
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
    var s = 0.0
    val ref = xs.zipWithIndex.map { case (x, i) =>
      s = math.max(0.0, s + (x - mean) / sd)
      i.toLong -> BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got shouldBe ref
  }

  test("cusumShift: replays the textbook recursion exactly") {
    val xs = Seq(10L, 11L, 9L, 10L, 30L, 32L, 31L) // shift at index 4
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "t", "x")
    val slack = 0.5
    val got = Stats.cusumShift(df, "g", "t", "x", slack = slack,
        threshold = 1.5).collect()
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Double]("cusum"), r.getAs[Boolean]("alarm"))).toMap
    // reference: sequential recursion over the standardized series
    val n = xs.length
    val mean = xs.sum.toDouble / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
    var s = 0.0
    val ref = xs.zipWithIndex.map { case (x, i) =>
      s = math.max(0.0, s + ((x - mean) / sd - slack))
      i.toLong -> BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got.view.mapValues(_._1).toMap shouldBe ref
    // quiet head, alarmed tail
    got(0L)._2 shouldBe false
    got(6L)._2 shouldBe true
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("nearestJoin: closest either direction, ties to the earlier right row") {
    val left = Seq((1L, 10L, ts("2026-01-01 10:00:00")),
      (2L, 10L, ts("2026-01-01 18:00:00")), // nothing within horizon
      (3L, 20L, ts("2026-01-01 10:00:00"))) // equidistant tie
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 09:59:00"), 101L, 1.0), // 60s before e1
      (10L, ts("2026-01-01 10:00:30"), 102L, 2.0), // 30s after e1 (wins)
      (20L, ts("2026-01-01 09:59:00"), 201L, 3.0), // tie: earlier wins
      (20L, ts("2026-01-01 10:01:00"), 202L, 4.0))
      .toDF("p_user", "p_ts", "pid", "pv")
    val out = Temporal.nearestJoin(left, right, "user_id", "p_user",
        "ts", "p_ts", Seq("pid", "pv"), horizonSeconds = 3600L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    out(1L) shouldBe Some(102L) // |30s| beats |60s| — FORWARD match
    out(2L) shouldBe None       // left-outer survives with null payload
    out(3L) shouldBe Some(201L) // equidistant -> earlier right row
  }

  test("nearestJoin: horizon-crossing neighbors are found via bucket replicas") {
    // left at 10:59:59 (bucket A), right at 11:00:01 (bucket B): the
    // ±1 replica makes them meet
    val left = Seq((1L, 5L, ts("2026-01-01 10:59:59")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((5L, ts("2026-01-01 11:00:01"), 9L, 1.0))
      .toDF("p_user", "p_ts", "pid", "pv")
    val out = Temporal.nearestJoin(left, right, "user_id", "p_user",
      "ts", "p_ts", Seq("pid", "pv"), horizonSeconds = 3600L).collect()
    out.head.getLong(3) shouldBe 9L
    val plan = Temporal.nearestJoin(left, right, "user_id", "p_user",
        "ts", "p_ts", Seq("pid", "pv"), horizonSeconds = 3600L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }

  test("imageDHash: gradient signs survive a brightness shift; patterns differ") {
    import graft.multimodal.Multimodal
    val h0 = Multimodal.imageDHash(Multimodal.syntheticColumnPng(10L))
    // +5 brightness on every column (id+5 shifts all grays equally
    // without crossing the 256 wrap in columns 0..8 for id 10):
    // gradient SIGNS identical -> same perceptual hash
    val h5 = Multimodal.imageDHash(Multimodal.syntheticColumnPng(15L))
    h0 shouldBe defined
    h0 shouldBe h5
    // a different pattern (descending columns via the wrap) differs
    val hOther = Multimodal.imageDHash(Multimodal.syntheticColumnPng(250L))
    h0 should not be hOther
    // formula check: id 10 -> every column ascends (10 + 31x stays
    // under 256 through x=7 -> wait 10+31*8=258 wraps at x=8): bits
    // x=0..6 set (g(x+1)>g(x)), x=7 compares g(8)=2 < g(7)=227 -> 0
    h0.get shouldBe "7f" * 8
  }

  test("topPaths: counts length-3 sequences, never crosses users") {
    val ev = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2026-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2026-01-01 10:02:00"), "purchase"),
      (4L, 1L, ts("2026-01-01 10:03:00"), "view"),
      (5L, 2L, ts("2026-01-01 10:00:00"), "view"),
      (6L, 2L, ts("2026-01-01 10:01:00"), "click") // only 2 events: no path
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.topPaths(ev, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    out shouldBe Map(
      ("view", "click", "purchase") -> 1L,
      ("click", "purchase", "view") -> 1L)
  }

  test("imageDHash: non-image bytes yield None; table op drops them") {
    import graft.multimodal.Multimodal
    Multimodal.imageDHash("not a png".getBytes) shouldBe None
    val media = Multimodal.synthesizeColumnImages(
      Seq(1L, 2L).toDF("media_id"))
    Multimodal.imageDHashTable(media).count() shouldBe 2L
  }
}
