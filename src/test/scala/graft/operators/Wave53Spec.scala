package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 53: expected calibration error, mixture-KL audit,
  * judge flip rate. */
class Wave53Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("expectedCalibrationError: perfectly calibrated bins read 0") {
    // raw 100 of 1000 (conf 0.1) with 10% positives, raw 900 (conf
    // 0.9) with 90% positives
    val rows = (1 to 10).map(i => (100L, i <= 1)) ++
      (1 to 10).map(i => (900L, i <= 9))
    val df = rows.toDF("raw", "label")
    val r = Eval.expectedCalibrationError(df, "raw", 1000L, "label",
      bins = 10).collect().head
    r.getLong(0) shouldBe 20L
    r.getDouble(1) shouldBe 0.0
    r.getDouble(2) shouldBe 0.0
  }

  test("expectedCalibrationError: one overconfident bin moves ECE by " +
    "its weight") {
    // all mass in the 0.9 bin, zero positives -> |0 - 0.9| = 0.9
    val df = (1 to 5).map(_ => (900L, false)).toDF("raw", "label")
    val r = Eval.expectedCalibrationError(df, "raw", 1000L, "label",
      bins = 10).collect().head
    r.getDouble(1) shouldBe 0.9
    r.getDouble(2) shouldBe 0.9
  }

  test("mixtureKl: matched mix reads 0, skew reads positive") {
    val even = Seq(("a", 50L), ("b", 50L)).toDF("s", "tok")
    val r0 = Sampling.mixtureKl(even, "s", "tok",
      Seq("a" -> 0.5, "b" -> 0.5)).collect().head
    r0.getDouble(2) shouldBe 0.0
    r0.getDouble(3) shouldBe 0.0
    val skew = Seq(("a", 90L), ("b", 10L)).toDF("s", "tok")
    val r1 = Sampling.mixtureKl(skew, "s", "tok",
      Seq("a" -> 0.5, "b" -> 0.5)).collect().head
    // 0.9 ln 1.8 + 0.1 ln 0.2 = 0.368070
    r1.getDouble(2) shouldBe 0.368074 +- 0.00001
    r1.getDouble(3) shouldBe 0.4
  }

  test("mixtureKl: an observed stratum missing from the target trips " +
    "the witness") {
    val df = Seq(("a", 10L), ("zzz", 10L)).toDF("s", "tok")
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureKl(df, "s", "tok", Seq("a" -> 1.0))
  }

  test("judgeFlipRate: only multi-trial pairs enter the denominator") {
    val df = Seq(
      (1L, "a"), (1L, "a"),          // consistent
      (2L, "a"), (2L, "b"),          // flipped
      (3L, "b"))                     // single trial — excluded
      .toDF("pair", "verdict")
    val r = Eval.judgeFlipRate(df, "pair", "verdict").collect().head
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 1L
    r.getDouble(3) shouldBe 0.5
  }
}
