package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Invariance / bound properties for the round-9 operator waves over
  * seeded random inputs (the PropertiesSpec discipline): mathematical
  * facts that must hold for EVERY input, probed across draws — row
  * order cannot matter, bounded statistics stay in their ranges, and
  * the Pareto frontier is verified against the brute-force dominance
  * definition it was designed to avoid computing. */
class Round9PropertiesSpec extends AnyFunSuite with Matchers
    with SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("gini is in [0, 1) and row-order invariant") {
    (1 to 3).foreach { trial =>
      val rows = (0 until 40).map(i =>
        ("g" + i % 3, rng.nextInt(1000).toLong))
      val a = Stats.giniConcentration(rows.toDF("g", "x"), "g", "x")
        .collect().map(r => r.getString(0) -> r.getAs[Double]("gini"))
        .toMap
      a.values.foreach { g =>
        g should be >= 0.0
        g should be < 1.0
      }
      val b = Stats.giniConcentration(
          rng.shuffle(rows).toDF("g", "x"), "g", "x")
        .collect().map(r => r.getString(0) -> r.getAs[Double]("gini"))
        .toMap
      withClue(s"trial $trial") { b shouldBe a }
    }
  }

  test("spearman is in [-1, 1]; any strictly monotone map scores 1") {
    val xs = rng.shuffle((1 to 30).toList)
    val mono = xs.map(x => ("m", x.toLong, (x * x).toLong)) // strictly up
    val noise = (0 until 30).map(_ =>
      ("n", rng.nextInt(100).toLong, rng.nextInt(100).toLong))
    val r = Stats.spearman((mono ++ noise).toDF("g", "x", "y"),
        "g", "x", "y")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("rho")).toMap
    r("m") shouldBe 1.0
    r("n") should (be >= -1.0 and be <= 1.0)
  }

  test("theilSen recovers the slope of any exact line") {
    (1 to 3).foreach { _ =>
      val a = rng.nextInt(19) - 9 // integer slopes keep pair slopes exact
      val b = rng.nextInt(100)
      val pts = (0 until 20).map(t => ("l", t.toLong, (a * t + b).toLong))
      val r = Stats.theilSen(pts.toDF("g", "t", "x"), "g", "t", "x")
        .collect().head
      r.getAs[Double]("slope") shouldBe a.toDouble
    }
  }

  test("psi >= 0 always (Gibbs), one-sided bins never go negative") {
    (1 to 3).foreach { trial =>
      val rows = (0 until 200).map(_ => ("g", rng.nextBoolean(),
        rng.nextGaussian() * 30 + 50))
      val r = Stats.psiDrift(rows.toDF("g", "early", "x"),
          "g", "early", "x", width = 10.0)
        .collect().head
      withClue(s"trial $trial") {
        r.getAs[Double]("psi") should be >= 0.0
      }
    }
  }

  test("ks_stat is in [0, 1] and row-order invariant") {
    val rows = (0 until 150).map(_ => ("g", rng.nextBoolean(),
      rng.nextGaussian() * 10))
    val a = Stats.ks2Sample(rows.toDF("g", "early", "x"),
      "g", "early", "x").collect().head.getAs[Double]("ks_stat")
    a should (be >= 0.0 and be <= 1.0)
    val b = Stats.ks2Sample(rng.shuffle(rows).toDF("g", "early", "x"),
      "g", "early", "x").collect().head.getAs[Double]("ks_stat")
    b shouldBe a
  }

  test("mix entropy is in [0, log2(n_cats)]") {
    val rows = (0 until 120).map(_ =>
      ("s" + rng.nextInt(3), "c" + rng.nextInt(5)))
    Profile.mixEntropy(rows.toDF("g", "c"), "g", "c")
      .collect().foreach { r =>
        val h = r.getAs[Double]("entropy")
        val k = r.getAs[Long]("n_cats")
        h should be >= 0.0
        h should be <= (math.log(k.toDouble) / math.log(2.0) + 1e-9)
      }
  }

  test("pareto frontier matches the brute-force dominance definition") {
    (1 to 3).foreach { trial =>
      val pts = (0 until 25).map(_ =>
        ("g", rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      val got = Sampling.paretoFrontier2D(pts.toDF("g", "cost", "gain"),
          "g", "cost", "gain")
        .collect().map(r => (r.getAs[Long]("cost"), r.getAs[Long]("gain")))
        .sorted
      def dominated(p: (Long, Long)) = pts.exists { case (_, c, g) =>
        (c < p._1 && g >= p._2) || (c <= p._1 && g > p._2)
      }
      val want = pts.map(p => (p._2, p._3)).filterNot(dominated).sorted
      withClue(s"trial $trial") { got shouldBe want }
    }
  }

  test("changelogCompact is arrival-order invariant (monoid)") {
    val log = (0 until 60).map { i =>
      ("k" + i % 7, i.toLong, Seq("I", "U", "D")(rng.nextInt(3)),
        rng.nextDouble())
    }
    def run(rows: Seq[(String, Long, String, Double)]) =
      Dedup.changelogCompact(rows.toDF("k", "seq", "op", "v"),
          "k", "seq", "op", "v")
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_changes"), r.getAs[String]("net_op"),
            r.getAs[Double]("last_val"))).toMap
    run(rng.shuffle(log)) shouldBe run(log)
  }

  test("histogram quantile estimates are monotone in p and in-range") {
    val rows = (0 until 300).map(_ => ("g", rng.nextDouble() * 100))
    val r = Profile.histogramQuantiles(rows.toDF("g", "x"), "g", "x",
        width = 10.0, probs = Seq(0.1, 0.5, 0.9, 0.99))
      .collect().map(x => x.getAs[Double]("prob") ->
        x.getAs[Double]("est")).toMap
    r(0.1) should be <= r(0.5)
    r(0.5) should be <= r(0.9)
    r(0.9) should be <= r(0.99)
    r.values.foreach { e => e should (be >= 0.0 and be <= 100.0) }
  }
}
