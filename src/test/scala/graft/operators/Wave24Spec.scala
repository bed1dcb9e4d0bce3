package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-24: WoE/IV scoring, dow seasonal decomposition,
  * equal-frequency binning, grid nearest-neighbor, two-proportion
  * z-test — hand-computed tables throughout. */
class Wave24Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("weightOfEvidence: log-ratio WoE, IV contributions, null one-sided") {
    // A: 3 good / 1 bad; B: 1/3; C: 0/2 (one-sided). gt=4, bt=6.
    val rows = Seq.fill(3)(("A", true)) ++ Seq(("A", false)) ++
      Seq(("B", true)) ++ Seq.fill(3)(("B", false)) ++
      Seq.fill(2)(("C", false))
    val r = Stats.weightOfEvidence(rows.toDF("f", "y"), "f", "y")
      .collect()
    r.map(_.getString(0)) shouldBe Array("A", "B", "C")
    val a = r(0)
    a.getLong(1) shouldBe 3L
    a.getLong(2) shouldBe 1L
    a.getDouble(3) shouldBe 0.75
    a.getDouble(4) shouldBe 0.166667
    a.getDouble(5) shouldBe 1.504077 // ln 4.5
    a.getDouble(6) shouldBe 0.877378
    val b = r(1)
    b.getDouble(5) shouldBe -0.693147 // ln 0.5
    b.getDouble(6) shouldBe 0.173287
    val c = r(2)
    c.getDouble(3) shouldBe 0.0
    c.isNullAt(5) shouldBe true
    c.isNullAt(6) shouldBe true
  }

  test("seasonalDow: linear trend detrends to zero everywhere") {
    val df = (0L to 8L).map(d => ("g", d, d)).toDF("g", "day", "x")
    val r = Stats.seasonalDow(df, "g", "day", "x").collect()
    r.length shouldBe 9
    val d3 = r.find(_.getLong(1) == 3L).get
    d3.getDouble(3) shouldBe 3.0 // trend = MA of linear
    d3.getDouble(4) shouldBe 0.0 // seasonal
    d3.getDouble(5) shouldBe 0.0 // remainder
    r.find(_.getLong(1) == 0L).get.isNullAt(3) shouldBe true // edge
  }

  test("seasonalDow: weekly spike separates into the dow profile") {
    // x = 7 on dow 0 (days 3, 10), else 0 over days 0..13: every full
    // window sums 7 -> trend 1; seasonal dow0 = +6, others = -1;
    // remainder exactly 0 on all full-window rows
    val df = (0L to 13L)
      .map(d => ("s", d, if ((d + 4) % 7 == 0) 7L else 0L))
      .toDF("g", "day", "x")
    val r = Stats.seasonalDow(df, "g", "day", "x").collect()
    val d3 = r.find(_.getLong(1) == 3L).get
    d3.getDouble(3) shouldBe 1.0
    d3.getDouble(4) shouldBe 6.0
    d3.getDouble(5) shouldBe 0.0
    val d4 = r.find(_.getLong(1) == 4L).get
    d4.getDouble(4) shouldBe -1.0
    d4.getDouble(5) shouldBe 0.0
    // edge day keeps the profile seasonal but null trend/remainder
    val d0 = r.find(_.getLong(1) == 0L).get
    d0.isNullAt(3) shouldBe true
    d0.getDouble(4) shouldBe -1.0
    d0.isNullAt(5) shouldBe true
  }

  test("equalFreqBins: clean halves and tie-collapsed bins") {
    val r = Profile.equalFreqBins((1 to 10).map(_.toDouble).toDF("v"),
      "v", k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3)))
    r shouldBe Array((1L, 5L, 1.0, 5.0), (2L, 5L, 6.0, 10.0))
    // heavy ties: all copies of a value share one bin; empty bins
    // are absent, not zero-padded
    val t = Profile.equalFreqBins(
      Seq(1.0, 1.0, 1.0, 1.0, 2.0, 2.0).toDF("v"), "v", k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    t shouldBe Array((1L, 4L), (3L, 2L))
  }

  test("gridNearest: 3x3 candidates, radius filter, composite tie-break") {
    val left = Seq((1L, 0.0, 0.0), (2L, 50.0, 50.0))
      .toDF("lid", "lat", "lon")
    val right = Seq((10L, 1.0, 1.0), (11L, -2.0, 2.0),
      (12L, 30.0, 0.0), (20L, 53.0, 54.0), (21L, 54.0, 53.0))
      .toDF("rid", "lat", "lon")
    val r = Geo.gridNearest(left, "lid", right, "rid", "lat", "lon",
      radius = 5.0).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .sortBy(_._1)
    // lid 2: both candidates at d2 = 25 (= radius^2, inclusive);
    // the smaller rid wins the tie
    r shouldBe Array((1L, 10L, 2.0), (2L, 20L, 25.0))
  }

  test("gridNearest: refuses a degenerate cell loudly") {
    val left = Seq((1L, 0.0, 0.0)).toDF("lid", "lat", "lon")
    val right = spark.range(Geo.MaxCellOccupancy + 1)
      .select(col("id").as("rid"), lit(0.5).as("lat"),
        lit(0.5).as("lon"))
    val e = intercept[IllegalArgumentException] {
      Geo.gridNearest(left, "lid", right, "rid", "lat", "lon", 5.0)
    }
    e.getMessage should include("MaxCellOccupancy")
  }

  test("proportionZTest: textbook 30/100 vs 20/100") {
    val rows = Seq.fill(30)((true, true)) ++
      Seq.fill(70)((true, false)) ++ Seq.fill(20)((false, true)) ++
      Seq.fill(80)((false, false))
    val r = Stats.proportionZTest(rows.toDF("arm", "out"), "arm",
      "out").collect().head
    r.getLong(0) shouldBe 100L
    r.getLong(1) shouldBe 30L
    r.getLong(2) shouldBe 100L
    r.getLong(3) shouldBe 20L
    r.getDouble(4) shouldBe 0.3
    r.getDouble(5) shouldBe 0.2
    r.getDouble(6) shouldBe 1.632993 // 0.1 / sqrt(.25*.75*.02)
    r.getBoolean(7) shouldBe false
  }

  test("calibrationBins: a negative raw score lands in bin 0") {
    val df = Seq((-5L, false), (3L, true)).toDF("raw", "y")
    val r = Eval.calibrationBins(df, "raw", maxRaw = 10L, "y",
      bins = 5).collect()
    r.map(_.getLong(0)).min shouldBe 0L // never a phantom bin
    r.find(_.getLong(0) == 0L).get.getLong(1) shouldBe 1L
  }

  test("proportionZTest: degenerate pools yield null z, false flag") {
    val r = Stats.proportionZTest(
      Seq((true, true), (false, true)).toDF("arm", "out"),
      "arm", "out").collect().head
    r.isNullAt(6) shouldBe true
    r.getBoolean(7) shouldBe false
  }
}
