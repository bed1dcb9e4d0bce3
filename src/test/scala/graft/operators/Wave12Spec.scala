package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-12: hand-computed fixtures for the five Stats
  * operators wired this round (theilSen, ewmaSmooth,
  * giniConcentration, changePoint, abTestProportions). Each value
  * below is derivable by hand from the operator's closed form, so a
  * regression is attributable to the operator, not the fixture. */
class Wave12Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("theilSen: discrete median of pair slopes") {
    // pairs of (t,x)=[(0,1),(1,3),(2,2),(3,6)] give slopes
    // [2, 0.5, 5/3, -1, 1.5, 4]; sorted [-1, .5, 1.5, 5/3, 2, 4];
    // percentile_disc(0.5) = first with cume_dist >= .5 = 1.5
    val df = Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 2L),
      ("a", 3L, 6L)).toDF("g", "t", "x")
    val r = Stats.theilSen(df, "g", "t", "x").collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_pairs") shouldBe 6L
    r.head.getAs[Double]("slope") shouldBe 1.5
  }

  test("ewmaSmooth: calendar-gap weights decay by day distance") {
    // x=[2@0, 4@1, 8@3] with a missing day 2; alpha=.5 weights are
    // powers of two: t=3 averages (8*1 + 4*.25 + 2*.125)/1.375
    val df = Seq(("a", 0L, 2.0), ("a", 1L, 4.0), ("a", 3L, 8.0))
      .toDF("g", "t", "x")
    val r = Stats.ewmaSmooth(df, "g", "t", "x")
      .collect().map(x => x.getAs[Long]("t") -> x.getAs[Double]("ewma"))
      .toMap
    r(0L) shouldBe 2.0
    r(1L) shouldBe (10.0 / 3.0 +- 1e-6)
    r(3L) shouldBe (9.25 / 1.375 +- 1e-6)
  }

  test("giniConcentration: uniform is 0, fully concentrated is (n-1)/n") {
    // [1,1,1,1] -> G=0; [0,0,0,10] -> ranks put 10 at i=4:
    // G = 2*40/(4*10) - 5/4 = 0.75
    val df = Seq(("u", 1L), ("u", 1L), ("u", 1L), ("u", 1L),
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 10L)).toDF("g", "x")
    val r = Stats.giniConcentration(df, "g", "x")
      .collect().map(x => x.getAs[String]("g") -> x.getAs[Double]("gini"))
      .toMap
    r("u") shouldBe 0.0
    r("c") shouldBe 0.75
  }

  test("changePoint: finds the level shift with max variance reduction") {
    // [1,1,1,5,5]: best split after the 3rd point; gain =
    // 9/3 + 100/2 - 169/5 = 19.2, means 1 and 5
    val df = Seq(("a", 0L, 1L), ("a", 1L, 1L), ("a", 2L, 1L),
      ("a", 3L, 5L), ("a", 4L, 5L)).toDF("g", "t", "x")
    val r = Stats.changePoint(df, "g", "t", "x").collect()
    r.length shouldBe 1
    r.head.getAs[Long]("split_t") shouldBe 2L
    r.head.getAs[Double]("gain") shouldBe (19.2 +- 1e-9)
    r.head.getAs[Double]("mean_left") shouldBe 1.0
    r.head.getAs[Double]("mean_right") shouldBe 5.0
    r.head.getAs[Long]("n") shouldBe 5L
  }

  test("abTestProportions: pooled two-sample z, flag on |z| > 1.96") {
    // A: 2/4 vs B: 0/4 -> pp=.25,
    // z = .5/sqrt(.25*.75*.5) = 1.632993 (not significant);
    // A vs C: 2/4 vs 4/4 -> pp=.75, z = -.5/sqrt(.75*.25*.5)
    // = -1.632993 (not significant)
    val df = (Seq.fill(2)(("A", true)) ++ Seq.fill(2)(("A", false)) ++
      Seq.fill(4)(("B", false)) ++ Seq.fill(4)(("C", true)))
      .toDF("variant", "conv")
    val r = Stats.abTestProportions(df, "variant", "conv")
      .collect()
      .map(x => (x.getAs[String]("variant_a"),
        x.getAs[String]("variant_b")) ->
        (x.getAs[Double]("z"), x.getAs[Boolean]("significant")))
      .toMap
    r.size shouldBe 3
    r(("A", "B"))._1 shouldBe (1.632993 +- 1e-6)
    r(("A", "B"))._2 shouldBe false
    r(("A", "C"))._1 shouldBe (-1.632993 +- 1e-6)
    // B 0/4 vs C 4/4: pp=.5, z = -1/sqrt(.5*.5*.5) = -2.828427
    r(("B", "C"))._1 shouldBe (-2.828427 +- 1e-6)
    r(("B", "C"))._2 shouldBe true
  }
}
