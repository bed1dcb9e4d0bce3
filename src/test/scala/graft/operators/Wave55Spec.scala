package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 55: annotator agreement (Cohen/Fleiss), preference
  * pairs, scaling-law fits, readability, PII scan, repetition runs,
  * turn alternation — each pinned by a hand-computed fixture. */
class Wave55Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("cohenKappa: hand contingency (classic 2x2) reproduces the " +
    "textbook value") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no:
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5
    // kappa = (0.7-0.5)/0.5 = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    r.getLong(0) shouldBe 50L
    r.getDouble(1) shouldBe 0.7
    r.getDouble(2) shouldBe 0.5
    r.getDouble(3) shouldBe 0.4
  }

  test("cohenKappa: perfect single-category agreement has pe=1, " +
    "kappa null") {
    val r = Stats.cohenKappa(
      Seq.fill(5)(("x", "x")).toDF("a", "b"), "a", "b").head()
    r.getDouble(2) shouldBe 1.0
    r.isNullAt(3) shouldBe true
  }

  test("fleissKappa: unanimous panel reads kappa 1; unequal panel " +
    "trips the probe") {
    val unanimous = (1 to 4).flatMap(i =>
      Seq.fill(3)((i.toLong, s"cat${i % 2}"))).toDF("item", "cat")
    val r = Stats.fleissKappa(unanimous, "item", "cat").head()
    r.getDouble(2) shouldBe 1.0 // p_bar
    r.getDouble(4) shouldBe 1.0 // kappa
    val uneven = (Seq.fill(3)((1L, "a")) ++ Seq.fill(2)((2L, "a")))
      .toDF("item", "cat")
    val e = intercept[IllegalArgumentException] {
      Stats.fleissKappa(uneven, "item", "cat")
    }
    e.getMessage should include("unequal")
  }

  test("fleissKappa: hand case — 2 items, 2 raters, half agreement") {
    // item1: a,a (unanimous); item2: a,b (split)
    // n=2: P1 = (4-2)/2 = 1; P2 = (1+1-2)/2 = 0 -> p_bar = 0.5
    // pj: a=3/4, b=1/4 -> pe = 9/16 + 1/16 = 0.625
    // kappa = (0.5-0.625)/0.375 = -0.333333
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("item", "cat")
    val r = Stats.fleissKappa(df, "item", "cat").head()
    r.getDouble(2) shouldBe 0.5
    r.getDouble(3) shouldBe 0.625
    r.getDouble(4) shouldBe -0.333333 +- 1e-9
  }

  test("pairsFromRankings: k=3 yields the 3 ordered pairs with rank " +
    "margins; duplicate ranks throw") {
    val df = Seq(("p", "best", 1L), ("p", "mid", 2L), ("p", "worst", 3L))
      .toDF("prompt", "cand", "rk")
    val pairs = Eval.pairsFromRankings(df, "prompt", "cand", "rk")
      .orderBy("margin", "winner").collect()
    pairs.length shouldBe 3
    pairs.map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toSet shouldBe Set(("best", "mid", 1L), ("mid", "worst", 1L),
        ("best", "worst", 2L))
    val dup = Seq(("p", "x", 1L), ("p", "y", 1L)).toDF("prompt", "cand", "rk")
    intercept[IllegalArgumentException] {
      Eval.pairsFromRankings(dup, "prompt", "cand", "rk")
    }.getMessage should include("duplicate rank")
  }

  test("scalingLawFit: an exact power law recovers slope and r2=1") {
    // y = 100 * x^-0.5 -> ln y = ln 100 - 0.5 ln x
    val pts = Seq(1.0, 4.0, 16.0, 64.0, 256.0)
      .map(x => ("c", x, 100.0 * math.pow(x, -0.5)))
      .toDF("cfg", "x", "y")
    val r = Stats.scalingLawFit(pts, "cfg", "x", "y").head()
    r.getLong(1) shouldBe 5L
    r.getDouble(2) shouldBe -0.5 +- 1e-9
    r.getDouble(3) shouldBe math.log(100.0) +- 1e-6
    r.getDouble(4) shouldBe 1.0 +- 1e-9
  }

  test("fleschKincaid: hand counts on a two-sentence text") {
    // "the cat sat. it ran!" -> words 5, sentences 2,
    // vowel groups: e,a,a,i,a = 5
    val r = TextQuality.fleschKincaid(
      Seq((1L, "the cat sat. it ran!")).toDF("id", "text"),
      "id", "text").head()
    r.getLong(1) shouldBe 5L
    r.getLong(2) shouldBe 2L
    r.getLong(3) shouldBe 5L
    // 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975
    r.getDouble(4) shouldBe 119.6975
    // 0.39*2.5 + 11.8*1.0 - 15.59 = -2.815
    r.getDouble(5) shouldBe -2.815
  }

  test("piiScan: planted email/phone/ipv4 each count once; clean " +
    "text counts zero") {
    val df = Seq(
      (1L, "reach me at bob@corp.io or 555-123-4567 from 10.0.0.1"),
      (2L, "nothing sensitive here")).toDF("id", "text")
    val r = Compliance.piiScan(df, "id", "text")
      .orderBy("id").collect()
    (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getBoolean(4)) shouldBe ((1L, 1L, 1L, true))
    (r(1).getLong(1), r(1).getLong(2), r(1).getLong(3),
      r(1).getBoolean(4)) shouldBe ((0L, 0L, 0L, false))
  }

  test("maxTokenRun: finds the longest identical-token run") {
    val df = Seq((1L, "a a a b b c"), (2L, "x y x y"), (3L, ""))
      .toDF("id", "text")
    val r = TextQuality.maxTokenRun(df, "id", "text")
      .orderBy("id").collect()
    r.map(_.getLong(1)) shouldBe Array(3L, 1L, 0L)
  }

  test("turnAlternation: counts consecutive same-type breaks per " +
    "stream") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) =
      new java.sql.Timestamp(t0.getTime + m * 60000L)
    val df = Seq(
      (1L, ts(0), 1L, "user"), (1L, ts(1), 2L, "user"), // violation
      (1L, ts(2), 3L, "assistant"), (1L, ts(3), 4L, "user"),
      (2L, ts(0), 5L, "user"), (2L, ts(1), 6L, "assistant"))
      .toDF("stream", "ts", "id", "typ")
    val r = Events.turnAlternation(df, "stream", "ts", "id", "typ")
      .orderBy("stream").collect()
    (r(0).getLong(1), r(0).getLong(2)) shouldBe ((4L, 1L))
    r(0).getDouble(3) shouldBe 0.333333 +- 1e-6
    (r(1).getLong(1), r(1).getLong(2)) shouldBe ((2L, 0L))
  }
}
