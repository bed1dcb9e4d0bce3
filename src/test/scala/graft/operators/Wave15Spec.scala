package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-15: hand-computed fixtures for changelogCompact,
  * histogramQuantiles, and centroidDrift. */
class Wave15Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("changelogCompact: net-op truth table over seq-ordered churn") {
    // k1: I..U -> I (insert with the final payload)
    // k2: I..D -> N (born and died inside the log)
    // k3: U..D -> D; k4: D..I -> U (delete then re-insert = update)
    val log = Seq(
      ("k1", 1L, "I", 10.0), ("k1", 2L, "U", 20.0),
      ("k2", 1L, "I", 5.0), ("k2", 3L, "D", 0.0),
      ("k3", 2L, "U", 7.0), ("k3", 5L, "D", 1.0),
      ("k4", 1L, "D", 0.0), ("k4", 2L, "I", 9.0))
      .toDF("key", "seq", "op", "value")
    val r = Dedup.changelogCompact(log, "key", "seq", "op", "value")
      .collect().map(x => x.getAs[String]("key") ->
        (x.getAs[Long]("n_changes"), x.getAs[String]("first_op"),
          x.getAs[String]("last_op"), x.getAs[String]("net_op"),
          x.getAs[Double]("last_val"))).toMap
    r("k1") shouldBe ((2L, "I", "U", "I", 20.0))
    r("k2") shouldBe ((2L, "I", "D", "N", 0.0))
    r("k3") shouldBe ((2L, "U", "D", "D", 1.0))
    r("k4") shouldBe ((2L, "D", "I", "U", 9.0))
  }

  test("histogramQuantiles: in-bin interpolation on the declared grid") {
    // x = 0..9, width 5 -> bins {0:5, 1:5}, n=10;
    // p50: target 5 lands at the top of bin 0 -> 0 + 5*(5-0)/5 = 5.0
    // p90: target 9 -> bin 1 -> 5 + 5*(9-5)/5 = 9.0
    val df = (0 until 10).map(i => ("g", i.toDouble)).toDF("g", "x")
    val r = Profile.histogramQuantiles(df, "g", "x", width = 5.0,
        probs = Seq(0.5, 0.9))
      .collect().map(x => x.getAs[Double]("prob") ->
        (x.getAs[Long]("n"), x.getAs[Double]("est"))).toMap
    r(0.5) shouldBe ((10L, 5.0))
    r(0.9) shouldBe ((10L, 9.0))
  }

  test("centroidDrift: orthogonal slices drift 1, identical slices 0") {
    // L: slice0 centroid [1,0], slice1 [0,1] -> cosine 0, drift 1;
    // M: both slices [1,0] -> cosine 1, drift 0
    val df = Seq(
      ("L", 0L, Array(1.0f, 0.0f)), ("L", 2L, Array(1.0f, 0.0f)),
      ("L", 1L, Array(0.0f, 1.0f)), ("L", 3L, Array(0.0f, 1.0f)),
      ("M", 0L, Array(1.0f, 0.0f)), ("M", 1L, Array(1.0f, 0.0f)))
      .toDF("label", "vec_id", "embedding")
    val r = EmbedAlgebra.centroidDrift(df, "label", "vec_id")
      .collect().map(x => x.getAs[String]("label") ->
        (x.getAs[Long]("n0"), x.getAs[Long]("n1"),
          x.getAs[Double]("cosine"), x.getAs[Double]("drift"))).toMap
    r("L") shouldBe ((2L, 2L, 0.0, 1.0))
    r("M") shouldBe ((1L, 1L, 1.0, 0.0))
  }
}
