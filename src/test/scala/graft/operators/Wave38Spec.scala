package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: Krippendorff's alpha, Chao1 vocabulary richness,
  * exact Pearson correlation matrix. */
class Wave38Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("krippendorffAlpha: ragged grid, hand-computed; " +
    "single-rater units dropped") {
    // u1: A,A | u2: A,B | u3: A,A,B | u4: A (dropped, unpairable)
    // occ = T2/1 + T3/2 = 2 + 1 = 3 -> A_o = 3/7
    // n_c: A=5, B=2 -> A_e = (20+2)/42 = 11/21
    // alpha = (3/7 - 11/21)/(1 - 11/21) = -0.2
    val df = Seq(
      (1, 1, "A"), (1, 2, "A"),
      (2, 1, "A"), (2, 2, "B"),
      (3, 1, "A"), (3, 2, "A"), (3, 3, "B"),
      (4, 1, "A"))
      .toDF("item", "rater", "cat")
    val out = Eval.krippendorffAlpha(df, "item", "rater", "cat")
      .collect().head
    out.getLong(0) shouldBe 3L  // n_units (u4 dropped)
    out.getLong(1) shouldBe 7L  // n_vals
    out.getDouble(2) shouldBe 0.428571
    out.getDouble(3) shouldBe 0.52381
    out.getDouble(4) shouldBe -0.2
  }

  test("krippendorffAlpha: perfect agreement gives alpha 1") {
    val df = Seq(
      (1, 1, "A"), (1, 2, "A"),
      (2, 1, "B"), (2, 2, "B"))
      .toDF("item", "rater", "cat")
    Eval.krippendorffAlpha(df, "item", "rater", "cat")
      .collect().head.getDouble(4) shouldBe 1.0
  }

  test("vocabRichness: Chao1 from the singleton/doubleton spectrum") {
    // tokens a:2 b:2 c:1 d:2 -> V=4 F1=1 F2=3 -> chao1 = 4 + 0 = 4
    val flat = Seq("a b a c", "d d b").toDF("text")
    val r1 = TextQuality.vocabRichness(flat, "text").collect().head
    (r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getDouble(4)) shouldBe ((7L, 4L, 1L, 3L, 4.0))
    // x:1 y:1 z:1 q:2 -> V=4 F1=3 F2=1 -> 4 + 3*2/(2*2) = 5.5
    val tail = Seq("x y z q q").toDF("text")
    TextQuality.vocabRichness(tail, "text")
      .collect().head.getDouble(4) shouldBe 5.5
  }

  test("pearsonMatrix: exact +1/-1/undefined, declared scales, " +
    "null rows dropped") {
    val df = Seq(
      (Some(1.0), 2.0, 5.0, 3.0, 0.01),
      (Some(2.0), 4.0, 5.0, 2.0, 0.02),
      (Some(3.0), 6.0, 5.0, 1.0, 0.03),
      (None, 9.0, 9.0, 9.0, 0.09)) // any-null row: dropped
      .toDF("x", "y", "z", "w", "v")
    val out = Stats.pearsonMatrix(df,
        Seq(("x", 1L), ("y", 1L), ("z", 1L), ("w", 1L), ("v", 100L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None
          else Some(r.getDouble(3))))).toMap
    out(("x", "y")) shouldBe ((3L, Some(1.0)))
    out(("x", "z")) shouldBe ((3L, None)) // zero variance
    out(("x", "w")) shouldBe ((3L, Some(-1.0)))
    out(("x", "v")) shouldBe ((3L, Some(1.0))) // 0.01 scale-100 grid
    out(("y", "w")) shouldBe ((3L, Some(-1.0)))
    out.size shouldBe 10
  }
}
