package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 50: judge position bias, refusal rate, best-of-n
  * scaling, tool-call pairing QA. */
class Wave50Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("positionBias: per-position win rates on a hand-built log") {
    val battles = Seq(("A", "B", "a"), ("B", "A", "a"), ("A", "B", "tie"))
      .toDF("ma", "mb", "w")
    val r = Eval.positionBias(battles, "ma", "mb", "w").collect().head
    r.getString(0) shouldBe "A"
    r.getString(1) shouldBe "B"
    r.getLong(2) shouldBe 2L     // A shown first twice
    r.getLong(3) shouldBe 1L
    r.getDouble(4) shouldBe 0.5  // one win, one tie when first
    r.getDouble(5) shouldBe 0.0  // B won the swapped battle
    r.getDouble(6) shouldBe 0.5
  }

  test("refusalRate: marker list fires case-insensitively") {
    val df = Seq(
      ("m", "I cannot do that for you"),
      ("m", "sure thing, here you go"),
      ("m", "AS AN AI I must refuse"))
      .toDF("cfg", "text")
    val r = Eval.refusalRate(df, "cfg", "text").collect().head
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 2L
    r.getDouble(3) shouldBe 0.666667
  }

  test("bestOfN: n=1 is the mean, n=k is the max; partial prompts drop") {
    val df = Seq(
      ("p", 1L, 1.0), ("p", 2L, 3.0), // full prompt, k=2
      ("q", 1L, 9.0))                 // only one sample -> dropped
      .toDF("prompt", "id", "reward")
    val out = Eval.bestOfN(df, "prompt", "id", "reward", k = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    out(1) shouldBe ((1L, 2.0)) // E[max of 1] = mean
    out(2) shouldBe ((1L, 3.0)) // E[max of 2] = the max
  }

  test("bestOfN: k=3 middle order statistic weighting, hand-checked") {
    // rewards 0, 1, 2 sorted; n=2 weights C(rn-1,1)/C(3,2) = (rn-1)/3
    // -> bo_2 = (0*0 + 1*1 + 2*2)/3 = 5/3
    val df = Seq(("p", 1L, 0.0), ("p", 2L, 1.0), ("p", 3L, 2.0))
      .toDF("prompt", "id", "reward")
    val out = Eval.bestOfN(df, "prompt", "id", "reward", k = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    out(1) shouldBe 1.0
    out(2) shouldBe 1.666667
    out(3) shouldBe 2.0
  }

  test("toolCallPairingQa: dangling call and orphan result flag; " +
    "clean trace passes") {
    val ts = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts.getTime + s * 1000L)
    val df = Seq(
      (1L, 10L, t(1), "call"), (1L, 11L, t(2), "result"),
      (1L, 12L, t(3), "call"), (1L, 13L, t(4), "other"),
      (1L, 14L, t(5), "result"),
      (2L, 20L, t(1), "call"), (2L, 21L, t(2), "result"))
      .toDF("trace", "id", "ts", "role")
    val out = Events.toolCallPairingQa(df, "trace", "id", "ts", "role")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    out(1L) shouldBe ((2L, 2L, 1L, 1L, false))
    out(2L) shouldBe ((1L, 1L, 0L, 0L, true))
  }
}
