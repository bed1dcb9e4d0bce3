package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 62: two-sample drift completions (Mann-Whitney U,
  * Wasserstein-1). */
class Wave62Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("mannWhitney: hand U for a clean separation, z sign follows " +
    "the shift") {
    // a = {1,2,3}, b = {4,5,6}: ranks a = 1,2,3 -> U = 6 - 6 = 0
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _))).toDF("s", "v")
    val r = Stats.mannWhitney(df, "s", "v", "a", "b").head()
    (r.getLong(0), r.getLong(1)) shouldBe ((3L, 3L))
    r.getDouble(2) shouldBe 0.0
    r.getDouble(3) should be < 0.0 // a below b
  }

  test("mannWhitney: identical samples read U = n^2/2 and z = 0") {
    val df = (1 to 10).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("s", "v")
    val r = Stats.mannWhitney(df, "s", "v", "a", "b").head()
    r.getDouble(2) shouldBe 50.0 // U = mu under H0
    r.getDouble(3) shouldBe 0.0
  }

  test("mannWhitney: ties take fractional ranks (hand case)") {
    // a = {1, 2}, b = {2, 3}: pooled ranks 1, 2.5, 2.5, 4
    // ra = 1 + 2.5 = 3.5 -> U = 3.5 - 3 = 0.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("s", "v")
    Stats.mannWhitney(df, "s", "v", "a", "b").head()
      .getDouble(2) shouldBe 0.5
  }

  test("wasserstein1: hand area — unit shift reads W1 = 1") {
    // a = {0, 1}, b = {1, 2}: |Fa - Fb| is 0.5 on [0,1) and 0.5 on
    // [1,2) -> W1 = 1.0
    val df = (Seq(0.0, 1.0).map(("a", _)) ++ Seq(1.0, 2.0).map(("b", _)))
      .toDF("s", "v")
    Stats.wasserstein1(df, "s", "v", "a", "b").head()
      .getDouble(2) shouldBe 1.0
  }

  test("wasserstein1: identical samples read 0; magnitude scales " +
    "with the shift") {
    val same = (1 to 20).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("s", "v")
    Stats.wasserstein1(same, "s", "v", "a", "b").head()
      .getDouble(2) shouldBe 0.0
    val shifted = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", i + 7.0))).toDF("s", "v")
    Stats.wasserstein1(shifted, "s", "v", "a", "b").head()
      .getDouble(2) shouldBe 7.0
  }
}
