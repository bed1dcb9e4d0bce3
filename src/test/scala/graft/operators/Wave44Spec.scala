package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: Hill tail index, negative-sampling distribution. */
class Wave44Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("hillTailIndex: exp-spaced top values give the closed-form " +
    "log-gap mean; under k+1 rows yields no estimate") {
    // top 11 values e^10..e^0: x_(11) = 1, sum ln(v/1) = 55 -> hill
    // 5.5, alpha 1/5.5
    val vals = (0 to 10).map(i => math.exp(i)) ++ Seq(0.5, 0.4, 0.3)
    val df = vals.toDF("v")
    val r = Stats.hillTailIndex(df, "v", k = 10).collect().head
    r.getLong(0) shouldBe 10L
    r.getDouble(1) shouldBe 1.0
    r.getDouble(2) shouldBe 5.5
    r.getDouble(3) shouldBe 0.181818
    Stats.hillTailIndex(Seq(1.0, 2.0, 3.0).toDF("v"), "v", k = 10)
      .collect() shouldBe empty
  }

  test("negSamplingDist: c^0.75 shares over the (count desc, token) " +
    "top-v vocabulary") {
    val df = Seq("a a a a b b c").toDF("text")
    val out = Sampling.negSamplingDist(df, "text", v = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    out.keySet shouldBe Set("a", "b") // c cut by v=2
    out("a") shouldBe ((4L, 0.627115))
    out("b") shouldBe ((2L, 0.372885))
  }
}
