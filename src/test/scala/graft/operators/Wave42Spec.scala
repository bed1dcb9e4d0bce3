package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: Welch t-test, CUPED adjustment. */
class Wave42Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("welchTTest: hand-computed unequal-variance example at " +
    "scale 100") {
    // A: 1.00/2.00/3.00 -> var 1.0 (1e4 cents2), B: 2.00/4.00 -> 2.0
    // t = -100/sqrt(1e4/3 + 1e4) = -0.866025, df = 1.6842
    val df = Seq(
      (1.00, "A"), (2.00, "A"), (3.00, "A"),
      (2.00, "B"), (4.00, "B"))
      .toDF("v", "grp")
    val r = Stats.welchTTest(df, "v", scale = 100L, "grp")
      .collect().head
    r.getString(0) shouldBe "A"
    r.getLong(2) shouldBe 3L
    r.getLong(3) shouldBe 2L
    r.getDouble(4) shouldBe 2.0 // mean_a natural units
    r.getDouble(5) shouldBe 3.0
    r.getDouble(6) shouldBe -0.866025
    r.getDouble(7) shouldBe 1.6842
  }

  test("welchTTest: relabeling the groups flips the sign of t and " +
    "keeps df (groups are lexicographic, stats symmetric)") {
    val df = Seq(
      (1.00, "X"), (2.00, "X"), (3.00, "X"),
      (2.00, "B"), (4.00, "B")) // B sorts FIRST now
      .toDF("v", "grp")
    val r = Stats.welchTTest(df, "v", scale = 100L, "grp")
      .collect().head
    r.getString(0) shouldBe "B"
    r.getDouble(6) shouldBe 0.866025 // sign flipped vs the A/B test
    r.getDouble(7) shouldBe 1.6842
  }

  test("welchTTest refuses anything but exactly two groups") {
    val three = Seq((1.0, "A"), (1.0, "B"), (1.0, "C"))
      .toDF("v", "grp")
    intercept[IllegalArgumentException] {
      Stats.welchTTest(three, "v", 100L, "grp").collect()
    }.getMessage should include("exactly 2 groups")
  }

  test("cupedAdjust: post = 2*pre + 1 adjusts both arms to the same " +
    "mean") {
    // theta = 2; A adj = 4 - 2*(1.5-2.5) = 6; B adj = 8 - 2*1 = 6
    val users = Seq(
      (1L, 3L, "A"), (2L, 5L, "A"),
      (3L, 7L, "B"), (4L, 9L, "B"))
      .toDF("pre", "post", "grp")
    val out = Stats.cupedAdjust(users, "pre", "post", scale = 1L,
        "grp")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    out("A") shouldBe ((2L, 4.0, 1.5, 2.0, 6.0))
    out("B") shouldBe ((2L, 8.0, 3.5, 2.0, 6.0))
  }
}
