package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-32: log histogram and IQR outlier fences. */
class Wave32Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("logHistogram: exact bit-length bins incl. the power-of-two edges") {
    val vals = Seq(1L, 7L, 8L, 1023L, 1024L, 0L, -3L)
    val r = Profile.logHistogram(vals.toDF("v"), "v").collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    r(0L) shouldBe ((2L, -3L, 0L)) // non-positive counted out loudly
    r(1L) shouldBe ((1L, 1L, 1L))
    r(3L) shouldBe ((1L, 7L, 7L))
    r(4L) shouldBe ((1L, 8L, 8L)) // 8 = 2^3 lands in bin 4, not 3
    r(10L) shouldBe ((1L, 1023L, 1023L))
    r(11L) shouldBe ((1L, 1024L, 1024L))
  }

  test("concentrationIndex: HHI, effective categories, CR-k") {
    // a:5 b:3 c:2 -> HHI = 38/100, eff = 100/38, CR-2 = 8/10
    val cats = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val r = Profile.concentrationIndex(cats.toDF("c"), "c", k = 2)
      .collect().head
    r.getLong(0) shouldBe 10L
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 0.38
    r.getDouble(3) shouldBe 2.631579
    r.getDouble(4) shouldBe 0.8
  }

  test("iqrOutliers: Tukey fences, strict-outside counts") {
    // group g: 1..11 plus 100: p25 (rank ceil(.25*12)=3) = 3,
    // p75 (rank 9) = 9 -> iqr 6 -> fences [-6, 18]; only 100 is out
    val vals = ((1 to 11).map(v => ("g", v.toDouble)) :+ ("g", 100.0))
    val r = Profile.iqrOutliers(vals.toDF("g", "v"), "g", "v")
      .collect().head
    r.getDouble(1) shouldBe 3.0
    r.getDouble(2) shouldBe 9.0
    r.getDouble(3) shouldBe -6.0
    r.getDouble(4) shouldBe 18.0
    r.getLong(5) shouldBe 12L
    r.getLong(6) shouldBe 1L
    r.getDouble(7) shouldBe 0.083333
  }
}
