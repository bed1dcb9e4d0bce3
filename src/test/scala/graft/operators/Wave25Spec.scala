package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-25: association rules, rolling bands, grouped AUC,
  * calibration bins, grouped percentiles. */
class Wave25Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("associationRules: support/confidence/lift, dup rows collapse") {
    // b1={A,B,C} (A listed twice), b2={A,B}, b3={A,B}, b4={C}
    val rows = Seq(("b1", "A"), ("b1", "A"), ("b1", "B"), ("b1", "C"),
      ("b2", "A"), ("b2", "B"), ("b3", "A"), ("b3", "B"), ("b4", "C"))
    val r = Baskets.associationRules(rows.toDF("b", "i"), "b", "i")
      .collect()
    r.length shouldBe 1 // (A,C) and (B,C) co-occur once: pruned
    val p = r.head
    p.getString(0) shouldBe "A"
    p.getString(1) shouldBe "B"
    p.getLong(2) shouldBe 3L // n_a
    p.getLong(3) shouldBe 3L // n_b
    p.getLong(4) shouldBe 3L // n_ab
    p.getDouble(5) shouldBe 0.75 // support over 4 baskets
    p.getDouble(6) shouldBe 1.0
    p.getDouble(7) shouldBe 1.0
    p.getDouble(8) shouldBe 1.333333 // lift 3*4/(3*3)
  }

  test("associationRules: refuses degenerate baskets loudly") {
    val big = spark.range(Baskets.MaxBasketSize + 1)
      .select(lit("mega").as("b"), col("id").as("i"))
    val e = intercept[IllegalArgumentException] {
      Baskets.associationRules(big, "b", "i")
    }
    e.getMessage should include("MaxBasketSize")
  }

  test("rollingBands: trailing window, sample sd, breach flag") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 10L)).toDF("g", "day", "x")
    val r = Stats.rollingBands(df, "g", "day", "x", window = 3,
      k = 1.0).collect()
    r.length shouldBe 4
    val d3 = r.find(_.getLong(1) == 3L).get
    d3.getDouble(3) shouldBe 2.0 // mean of 1,2,3
    d3.getDouble(4) shouldBe 1.0 // sample sd
    d3.getDouble(5) shouldBe 3.0
    d3.getDouble(6) shouldBe 1.0
    d3.getBoolean(7) shouldBe false // 3 is ON the band, not beyond
    val d4 = r.find(_.getLong(1) == 4L).get
    d4.getDouble(3) shouldBe 5.0 // mean of 2,3,10
    d4.getDouble(4) shouldBe 4.358899 // sqrt(19)
    d4.getBoolean(7) shouldBe true // 10 > 9.358899
    val d1 = r.find(_.getLong(1) == 1L).get
    d1.isNullAt(3) shouldBe true // incomplete window
    d1.getBoolean(7) shouldBe false
  }

  test("groupedAuc: tie-averaged ranks, degenerate group null") {
    val df = Seq(("g", 1L, false), ("g", 2L, true), ("g", 2L, false),
      ("g", 3L, true), ("h", 5L, true), ("h", 6L, true))
      .toDF("g", "score", "y")
    val rows = Eval.groupedAuc(df, "g", "score", "y").collect()
    val g = rows.find(_.getString(0) == "g").get
    g.getLong(1) shouldBe 2L
    g.getLong(2) shouldBe 2L
    g.getDouble(3) shouldBe 0.875 // R+ = 2.5 + 4
    val h = rows.find(_.getString(0) == "h").get
    h.isNullAt(3) shouldBe true // no negatives: no ranking to score
  }

  test("calibrationBins: capped score, declared grid, gap") {
    val df = Seq((1L, false), (9L, true), (10L, true), (15L, true))
      .toDF("raw", "y")
    val r = Eval.calibrationBins(df, "raw", maxRaw = 10L, "y",
      bins = 5).collect()
    r.length shouldBe 2
    val b0 = r.find(_.getLong(0) == 0L).get
    b0.getLong(1) shouldBe 1L
    b0.getDouble(2) shouldBe 0.1
    b0.getDouble(3) shouldBe 0.0
    b0.getDouble(4) shouldBe -0.1
    val b4 = r.find(_.getLong(0) == 4L).get
    b4.getLong(1) shouldBe 3L // 9, 10, and 15 capped to 10
    b4.getDouble(2) shouldBe 0.966667 // 29/30
    b4.getDouble(3) shouldBe 1.0
    b4.getDouble(4) shouldBe 0.033333
  }

  test("groupedPercentiles: disc ranks per group incl. the p99 edge") {
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      Seq(("b", 7.0), ("b", 7.0), ("b", 7.0))).toDF("g", "v")
    val r = Profile.groupedPercentiles(df, "g", "v",
      Seq(0.5, 0.9, 0.99)).collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
    r.toSet shouldBe Set(
      ("a", 0.5, 5.0), ("a", 0.9, 9.0), ("a", 0.99, 10.0),
      ("b", 0.5, 7.0), ("b", 0.9, 7.0), ("b", 0.99, 7.0))
  }
}
