package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 56: drift & concentration monitoring — PSI, KS
  * two-sample, Gini/HHI concentration, Benford audit, CUSUM. */
class Wave56Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("psi: identical splits read ~0; a full shift reads large") {
    val same = (1 to 100).flatMap(i =>
      Seq(("ref", i % 10 * 100L), ("cur", i % 10 * 100L)))
      .toDF("split", "raw")
    Stats.psi(same, "split", "raw", maxRaw = 1000L).head()
      .getDouble(2) shouldBe 0.0
    val shifted = ((1 to 100).map(_ => ("ref", 100L)) ++
      (1 to 100).map(_ => ("cur", 900L))).toDF("split", "raw")
    Stats.psi(shifted, "split", "raw", maxRaw = 1000L).head()
      .getDouble(2) should be > 1.0
  }

  test("psi: Laplace smoothing keeps empty bins finite") {
    val df = Seq(("ref", 0L), ("cur", 999L)).toDF("split", "raw")
    val p = Stats.psi(df, "split", "raw", maxRaw = 1000L).head()
      .getDouble(2)
    p.isNaN shouldBe false
    p.isInfinite shouldBe false
  }

  test("ksTest2: disjoint samples read D=1, identical read D~0") {
    val disjoint = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", 100.0 + i))).toDF("s", "v")
    val r = Stats.ksTest2(disjoint, "s", "v", "a", "b").head()
    r.getDouble(2) shouldBe 1.0
    r.getDouble(4) should be < 0.001 // p tiny
    val same = (1 to 20).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("s", "v")
    Stats.ksTest2(same, "s", "v", "a", "b").head()
      .getDouble(2) shouldBe 0.0
  }

  test("ksTest2: hand case — D at the known value") {
    // a = {1,2}, b = {2,3}: at v=1 gap=.5, v=2 gap=|1-.5|=.5, v=3 0
    // D=0.5 first attained at v=1
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("s", "v")
    val r = Stats.ksTest2(df, "s", "v", "a", "b").head()
    r.getDouble(2) shouldBe 0.5
    r.getDouble(3) shouldBe 1.0 // d_at: smallest value attaining D
  }

  test("concentration: equal weights read gini 0, hhi 1/n; " +
    "monopoly reads top1 1 and hhi 1") {
    val eq = (1 to 4).map(i => (s"g$i", 10L)).toDF("g", "w")
    val r = Stats.concentration(eq, "g", "w").head()
    r.getDouble(2) shouldBe 0.25
    r.getDouble(3) shouldBe 0.0
    r.getDouble(4) shouldBe 0.25
    val mono = Seq(("only", 100L)).toDF("g", "w")
    val m = Stats.concentration(mono, "g", "w").head()
    m.getDouble(2) shouldBe 1.0
    m.getDouble(3) shouldBe 0.0
    m.getDouble(4) shouldBe 1.0
  }

  test("concentration: hand gini for (1,3) weights") {
    // sorted (1,3): G = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 1.5 = 0.25
    val r = Stats.concentration(
      Seq(("a", 1L), ("b", 3L)).toDF("g", "w"), "g", "w").head()
    r.getDouble(3) shouldBe 0.25
  }

  test("benford: a Benford-conforming stream reads small chi2; " +
    "constant-leading-digit data reads huge") {
    // 9 digits with counts proportional to expected shares (x1000)
    val conforming = Stats.BenfordExpected.flatMap { case (d, e) =>
      Seq.fill(math.round(e * 1000).toInt)((d * 1.11))
    }.toDF("v")
    val ok = Stats.benford(conforming, "v").collect()
    ok.length shouldBe 9
    all(ok.map(_.getDouble(5))) should be < 5.0
    val rigged = Seq.fill(100)(9.99).toDF("v")
    Stats.benford(rigged, "v").head().getDouble(5) should be > 1000.0
  }

  test("benford: cents conversion keys the first digit, zeros drop") {
    // 0.05 -> 5 cents -> digit 5; 0.0 drops
    val r = Stats.benford(Seq(0.05, 0.0).toDF("v"), "v").collect()
    r.length shouldBe 1
    r.head.getInt(0) shouldBe 5
  }

  test("cusumDrift: an upward step change crosses drift_up at the " +
    "expected point; stable stream stays in control") {
    // 20 obs at target, then jump to target+60: S+ grows 55/obs,
    // crosses 500 at the 10th post-jump obs (seq 30)
    val rows = (1 to 20).map(i => ("s", i.toLong, 100.0)) ++
      (21 to 40).map(i => ("s", i.toLong, 160.0))
    val r = Stats.cusumDrift(rows.toDF("st", "seq", "v"), "st",
      "seq", "v", target = 100.0, slack = 5.0, threshold = 500.0)
      .head()
    r.getString(2) shouldBe "drift_up"
    r.getLong(3) shouldBe 30L
    val stable = (1 to 40).map(i => ("s", i.toLong, 100.0))
    Stats.cusumDrift(stable.toDF("st", "seq", "v"), "st", "seq", "v",
      100.0, 5.0, 500.0).head().getString(2) shouldBe "in_control"
  }

  test("cusumDrift: duplicate seq trips the determinism probe") {
    val df = Seq(("s", 1L, 1.0), ("s", 1L, 2.0)).toDF("st", "seq", "v")
    intercept[IllegalArgumentException] {
      Stats.cusumDrift(df, "st", "seq", "v", 0.0, 0.5, 10.0)
    }.getMessage should include("nondeterministic")
  }
}
