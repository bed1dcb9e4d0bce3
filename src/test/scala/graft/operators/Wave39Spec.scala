package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: log-rank test, Adjusted Rand Index. */
class Wave39Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("logRank: hand-computed two-arm example") {
    // A: events at t=1,2; B: event at t=1, censored at t=3
    // t=1: n=4 d=2 -> e1=1,   v=2*(2/4)*(2/4)*(2/3) = 1/3
    // t=2: n=2 d=1 -> e1=0.5, v=1*(1/2)*(1/2)*1     = 1/4
    // O_a=2, E_a=1.5, V=7/12 -> chi2 = 0.25/(7/12) = 3/7, z = +sqrt
    val units = Seq(
      (1L, true, "A"), (2L, true, "A"),
      (1L, true, "B"), (3L, false, "B"))
      .toDF("dur", "observed", "grp")
    val r = Survival.logRank(units, "dur", "observed", "grp")
      .collect().head
    r.getString(0) shouldBe "A"
    r.getString(1) shouldBe "B"
    r.getLong(2) shouldBe 2L
    r.getLong(3) shouldBe 2L
    r.getLong(4) shouldBe 2L          // O_a
    r.getDouble(5) shouldBe 1.5       // E_a
    r.getDouble(6) shouldBe 0.428571  // chi2 = 3/7
    r.getDouble(7) shouldBe 0.654654  // z
  }

  test("logRank refuses anything but exactly two groups") {
    val three = Seq((1L, true, "A"), (1L, true, "B"), (1L, true, "C"))
      .toDF("dur", "observed", "grp")
    val e = intercept[IllegalArgumentException] {
      Survival.logRank(three, "dur", "observed", "grp").collect()
    }
    e.getMessage should include("exactly 2 groups")
  }

  test("adjustedRandIndex: perfect match is 1, the textbook split " +
    "is 0, degenerate identical one-cluster partitions are 1") {
    val perfect = Seq((1, "A"), (1, "A"), (2, "B"), (2, "B"))
      .toDF("pred", "gold")
    val p = Eval.adjustedRandIndex(perfect, "pred", "gold")
      .collect().head
    (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3),
      p.getDouble(4)) shouldBe ((4L, 2L, 2L, 2L, 1.0))
    // {1,1,2,2} vs {A,A,A,B}: index=1, exp=1, max=2.5 -> 0
    val split = Seq((1, "A"), (1, "A"), (2, "A"), (2, "B"))
      .toDF("pred", "gold")
    Eval.adjustedRandIndex(split, "pred", "gold")
      .collect().head.getDouble(4) shouldBe 0.0
    // everything in one cluster both sides: identical trivial
    // partitions = perfect agreement -> 1 (sklearn convention)
    val degen = Seq((1, "A"), (1, "A"), (1, "A"), (1, "A"))
      .toDF("pred", "gold")
    Eval.adjustedRandIndex(degen, "pred", "gold")
      .collect().head.getDouble(4) shouldBe 1.0
  }
}
