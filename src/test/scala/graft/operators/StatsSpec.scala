package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class StatsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("corrMatrix matches hand-computed Pearson values") {
    // y = 2x exactly (corr 1), z anti-correlated with x (corr -1 on
    // this symmetric sample), w constant (corr null: zero variance)
    val df = Seq(
      (1.0, 2.0, 3.0, 5.0),
      (2.0, 4.0, 2.0, 5.0),
      (3.0, 6.0, 1.0, 5.0)
    ).toDF("x", "y", "z", "w")
    val m = Stats.corrMatrix(df, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    m(("x", "y")) shouldBe Some(1.0)
    m(("x", "z")) shouldBe Some(-1.0)
    m(("x", "w")) shouldBe None // zero-variance guard -> null, not NaN
    m.size shouldBe 6 // all unordered pairs exactly once
  }

  test("corrMatrix output is one row per unordered pair, long form") {
    val df = Seq((1.0, 2.0, 0.5), (2.0, 3.0, 0.1), (4.0, 1.0, 0.9))
      .toDF("a", "b", "c")
    val rows = Stats.corrMatrix(df, Seq("a", "b", "c")).collect()
    rows.map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("a", "b"), ("a", "c"), ("b", "c"))
  }

  test("jsDivergence: identical distributions give 0") {
    val df = Seq(
      ("s1", "alpha beta gamma"), ("s2", "alpha beta gamma"))
      .toDF("source", "text")
    val out = Stats.jsDivergence(df, "source", "text").collect()
    out should have length 1
    out.head.getString(0) shouldBe "s1"
    out.head.getString(1) shouldBe "s2"
    out.head.getDouble(2) shouldBe 0.0
  }

  test("jsDivergence: disjoint vocabularies give exactly 1 (log2)") {
    val df = Seq(("s1", "aa bb cc"), ("s2", "dd ee ff"))
      .toDF("source", "text")
    Stats.jsDivergence(df, "source", "text")
      .collect().head.getDouble(2) shouldBe 1.0
  }

  test("jsDivergence: hand-computed asymmetric-overlap value") {
    // p = {a: 1.0}; q = {a: 0.5, b: 0.5}; m = {a: .75, b: .25}
    // JSD = 0.5*(1*log2(1/.75)) + 0.5*(.5*log2(.5/.75) + .5*log2(.5/.25))
    val expected = BigDecimal(
      0.5 * (math.log(1 / 0.75) / math.log(2)) +
        0.5 * (0.5 * (math.log(0.5 / 0.75) / math.log(2)) +
          0.5 * (math.log(0.5 / 0.25) / math.log(2))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(("s1", "a a"), ("s2", "a b")).toDF("source", "text")
    Stats.jsDivergence(df, "source", "text")
      .collect().head.getDouble(2) shouldBe expected
  }

  test("zipfSlope matches the hand-computed ln-ln least squares fit") {
    // freqs: a x4, b x2, c x1 -> ranks 1,2,3 (count desc, token asc)
    val df = Seq(("s1", "a a a a b b c")).toDF("source", "text")
    val out = Stats.zipfSlope(df, "source", "text").collect().head
    val pts = Seq((math.log(1.0), math.log(4.0)),
      (math.log(2.0), math.log(2.0)), (math.log(3.0), math.log(1.0)))
    val (mx, my) = (pts.map(_._1).sum / 3, pts.map(_._2).sum / 3)
    val cov = pts.map { case (x, y) => (x - mx) * (y - my) }.sum / 3
    val vx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum / 3
    out.getLong(1) shouldBe 3L // n_types
    out.getDouble(2) shouldBe
      BigDecimal(cov / vx).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    out.getDouble(3) shouldBe
      BigDecimal(my - cov / vx * mx).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-6
  }

  test("zipfSlope null-guards a single-type source") {
    val df = Seq(("s1", "solo solo solo")).toDF("source", "text")
    val out = Stats.zipfSlope(df, "source", "text").collect().head
    out.getLong(1) shouldBe 1L
    out.isNullAt(2) shouldBe true
    out.isNullAt(3) shouldBe true
  }

  test("jsDivergence emits each pair once with s1 < s2, for K sources") {
    val df = Seq(("s1", "a b"), ("s2", "b c"), ("s3", "c d"))
      .toDF("source", "text")
    val pairs = Stats.jsDivergence(df, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    pairs.toSet shouldBe Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3"))
    all(pairs.map { case (a, b) => a < b }) shouldBe true
  }
}
