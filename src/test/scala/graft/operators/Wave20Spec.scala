package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-20: psiDrift (bands, one-sided bin reporting) and the
  * exact two-sample KS. */
class Wave20Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, Boolean, Double)]) =
    rows.toDF("g", "early", "x")

  test("psiDrift: identical slices are stable at psi 0") {
    val a = (0 until 10).map(i => ("g", true, i.toDouble))
    val b = (0 until 10).map(i => ("g", false, i.toDouble))
    val r = Stats.psiDrift(frame(a ++ b), "g", "early", "x", width = 5.0)
      .collect().head
    r.getAs[Double]("psi") shouldBe 0.0
    r.getAs[String]("band") shouldBe "stable"
    r.getAs[Long]("n_onesided") shouldBe 0L
  }

  test("psiDrift: mass swap across bins scores the closed form") {
    // A: 8 low + 2 high; B: 2 low + 8 high ->
    // psi = 2 * 0.6 * ln(4) = 1.663553 (major)
    val a = Seq.fill(8)(("g", true, 1.0)) ++ Seq.fill(2)(("g", true, 6.0))
    val b = Seq.fill(2)(("g", false, 1.0)) ++
      Seq.fill(8)(("g", false, 6.0))
    val r = Stats.psiDrift(frame(a ++ b), "g", "early", "x", width = 5.0)
      .collect().head
    r.getAs[Double]("psi") shouldBe (1.663553 +- 1e-6)
    r.getAs[String]("band") shouldBe "major"
    r.getAs[Long]("n_bins_common") shouldBe 2L
  }

  test("psiDrift: disjoint supports report one-sided bins, not a fudge") {
    val a = Seq.fill(5)(("g", true, 1.0))
    val b = Seq.fill(5)(("g", false, 11.0))
    val r = Stats.psiDrift(frame(a ++ b), "g", "early", "x", width = 5.0)
      .collect().head
    r.getAs[Double]("psi") shouldBe 0.0
    r.getAs[Long]("n_bins_common") shouldBe 0L
    r.getAs[Long]("n_onesided") shouldBe 2L
  }

  test("ks2Sample: shifted uniform gives D = 0.5, identical gives 0") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max ECDF gap 0.5 at v in [2,4];
    // critical = 1.358*sqrt(8/16) = 0.960251 -> not significant
    val a = Seq(1.0, 2.0, 3.0, 4.0).map(("g", true, _))
    val b = Seq(3.0, 4.0, 5.0, 6.0).map(("g", false, _))
    val r = Stats.ks2Sample(frame(a ++ b), "g", "early", "x")
      .collect().head
    r.getAs[Double]("ks_stat") shouldBe 0.5
    r.getAs[Double]("critical") shouldBe (0.960251 +- 1e-6)
    r.getAs[Boolean]("significant") shouldBe false
    val same = Stats.ks2Sample(frame(a ++ a.map(t => t.copy(_2 = false))),
        "g", "early", "x")
      .collect().head
    same.getAs[Double]("ks_stat") shouldBe 0.0
  }

  test("psiDrift: an all-one-slice group reports one-sided bins, no throw") {
    val onlyA = Seq.fill(6)(("g", true, 3.0))
    val r = Stats.psiDrift(frame(onlyA), "g", "early", "x", width = 5.0)
      .collect().head
    r.getAs[Double]("psi") shouldBe 0.0
    r.getAs[Long]("n_bins_common") shouldBe 0L
    r.getAs[Long]("n_onesided") shouldBe 1L
    r.getAs[Long]("n_b") shouldBe 0L
  }

  test("ks2Sample: an empty slice yields null stat and no flag, not NaN") {
    val onlyA = Seq(1.0, 2.0).map(("g", true, _))
    val r = Stats.ks2Sample(frame(onlyA), "g", "early", "x")
      .collect().head
    Option(r.getAs[java.lang.Double]("ks_stat")) shouldBe None
    Option(r.getAs[java.lang.Double]("critical")) shouldBe None
    r.getAs[Boolean]("significant") shouldBe false
  }
}
