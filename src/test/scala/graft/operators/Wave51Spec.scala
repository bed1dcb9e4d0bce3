package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 51: McNemar, BH FDR, power planning, needle-position
  * recall, SPRT sequential decisions. */
class Wave51Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("mcnemar: hand-computed discordant cells and statistic") {
    // 6 paired outcomes: n10=3, n01=1 -> (|3-1|-1)^2 / 4 = 0.25
    val df = Seq((true, false), (true, false), (true, false),
      (false, true), (true, true), (false, false)).toDF("a", "b")
    val r = Stats.mcnemar(df, "a", "b").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((6L, 3L, 1L, 1L))
    r.getDouble(4) shouldBe 0.25
  }

  test("mcnemar: zero discordance yields chi2 = 0") {
    val df = Seq((true, true), (false, false)).toDF("a", "b")
    Stats.mcnemar(df, "a", "b").collect().head.getDouble(4) shouldBe 0.0
  }

  test("bhCorrect: textbook step-down example") {
    // m=4, p = .01 .02 .03 .2: adj = min-from-top of p*m/rank
    // rank1: .04, rank2: .04, rank3: .04, rank4: .2
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.2))
      .toDF("t", "p")
    val out = Stats.bhCorrect(df, "t", "p", q = 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    out("a") shouldBe ((0.04, true))
    out("b") shouldBe ((0.04, true))
    out("c") shouldBe ((0.04, true))
    out("d") shouldBe ((0.2, false))
  }

  test("bhCorrect: the running min bounds every adjusted p by p_(m)") {
    // a's raw p*m/rank = 1.8, but the from-the-top running min pulls
    // it down to b's 0.95 — adjusted p never exceeds the largest p
    val df = Seq(("a", 0.9), ("b", 0.95)).toDF("t", "p")
    val out = Stats.bhCorrect(df, "t", "p")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    out("a") shouldBe 0.95
    out("b") shouldBe 0.95
  }

  test("powerTwoProportions: textbook 0.5 vs 0.6 at 5%/80% ~ 388/arm") {
    val df = Seq((0.5, 0.6)).toDF("p1", "p2")
    val r = Stats.powerTwoProportions(df, "p1", "p2").collect().head
    r.getLong(2) shouldBe 388L
  }

  test("powerTwoProportions: zero effect yields null n") {
    val df = Seq((0.5, 0.5)).toDF("p1", "p2")
    Stats.powerTwoProportions(df, "p1", "p2")
      .collect().head.isNullAt(2) shouldBe true
  }

  test("positionRecallCurve: binning and the 1.0 edge") {
    val df = Seq(("c", 0.05, true), ("c", 0.05, false),
      ("c", 1.0, true)).toDF("cfg", "pos", "ok")
    val out = Eval.positionRecallCurve(df, "cfg", "pos", "ok",
      bins = 10).collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getDouble(4)))).toMap
    out(0L) shouldBe ((2L, 0.5))
    out(9L) shouldBe ((1L, 1.0)) // pos 1.0 absorbed by the top bin
  }

  test("sprtDecision: a success streak accepts p1 at the exact " +
    "crossing step") {
    // ln(1.2) = 0.18232...; up = ln(19) = 2.9444 -> ceil(up/inc) = 17
    // consecutive successes cross at step 17
    val rows = (1 to 25).map(i => ("e", i.toLong, true))
    val df = rows.toDF("exp", "seq", "ok")
    val r = Stats.sprtDecision(df, "exp", "seq", "ok", 0.5, 0.6)
      .collect().head
    r.getString(2) shouldBe "accept_p1"
    r.getLong(3) shouldBe math.ceil(
      math.log(19.0) / math.log(1.2)).toLong
  }

  test("sprtDecision: no crossing reads continue at n_obs") {
    val df = Seq(("e", 1L, true), ("e", 2L, false), ("e", 3L, true),
      ("e", 4L, false)).toDF("exp", "seq", "ok")
    val r = Stats.sprtDecision(df, "exp", "seq", "ok", 0.5, 0.6)
      .collect().head
    r.getString(2) shouldBe "continue"
    r.getLong(3) shouldBe 4L
  }
}
