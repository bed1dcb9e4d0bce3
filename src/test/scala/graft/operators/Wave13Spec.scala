package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-13: hand-computed fixtures for the seven operators
  * wired this round (acf, spearman, adamicAdar, rrfFuse, interArrival,
  * histogramFixed, dowProfile). Every expected value is derivable by
  * hand from the operator's closed form. */
class Wave13Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("acf: perfect linear series correlates 1.0 at every usable lag") {
    // x=[1,2,3,4]@t=0..3: lag1 pairs (1,2),(2,3),(3,4) -> r=1;
    // lag2 -> r=1; lag3 has ONE pair -> zero variance -> null
    val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L),
      ("a", 3L, 4L)).toDF("g", "t", "x")
    val r = Stats.acf(df, "g", "t", "x", maxLag = 3)
      .collect().map(x => x.getAs[Long]("lag") ->
        (x.getAs[Long]("n_pairs"), Option(x.getAs[java.lang.Double]("acf"))))
      .toMap
    r(1L) shouldBe ((3L, Some(1.0)))
    r(2L) shouldBe ((2L, Some(1.0)))
    r(3L) shouldBe ((1L, None))
  }

  test("spearman: monotone ranks, average-rank ties") {
    // no ties: x=[1,2,3], y=[10,20,15] -> rank y=[1,3,2] -> rho=0.5
    // ties: x=[1,1,2] -> avg ranks [1.5,1.5,3]; y=[10,20,30] ->
    // rho = 0.5/sqrt(0.5 * 2/3) = 0.866025
    val df = Seq(("p", 1L, 10L), ("p", 2L, 20L), ("p", 3L, 15L),
      ("q", 1L, 10L), ("q", 1L, 20L), ("q", 2L, 30L))
      .toDF("g", "x", "y")
    val r = Stats.spearman(df, "g", "x", "y")
      .collect().map(x => x.getAs[String]("g") -> x.getAs[Double]("rho"))
      .toMap
    r("p") shouldBe 0.5
    r("q") shouldBe (0.866025 +- 1e-6)
  }

  test("adamicAdar: path wedge scores 1/ln(deg of middle)") {
    // path 1-2-3: one non-adjacent wedge (1,3) through z=2 (deg 2)
    // -> score 1/ln(2) = 1.442695; triangle edges predict nothing
    val df = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r = Graph.adamicAdar(df).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("a") shouldBe 1L
    r.head.getAs[Long]("b") shouldBe 3L
    r.head.getAs[Long]("common_neighbors") shouldBe 1L
    r.head.getAs[Double]("score") shouldBe (1.442695 +- 1e-6)
  }

  test("rrfFuse: 1/(k+rank) sums across rankers, rank by (score desc, id)") {
    // r1: id1(0.9)->1, id2(0.8)->2; r2: id3(0.9)->1, id1(0.1)->2
    // id1: 1/61 + 1/62 = 0.032522; id2: 1/62; id3: 1/61
    val df = Seq(("q", "r1", 1L, 0.9), ("q", "r1", 2L, 0.8),
      ("q", "r2", 3L, 0.9), ("q", "r2", 1L, 0.1))
      .toDF("query", "ranker", "id", "score")
    val r = Search.rrfFuse(df, "query", "ranker", "id", "score",
        k = 60, topK = 3)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("n_rankers"), x.getAs[Double]("rrf"))).toMap
    r(1L)._1 shouldBe 2L
    r(1L)._2 shouldBe (0.032522 +- 1e-6)
    r(2L) shouldBe ((1L, 0.016129))
    r(3L) shouldBe ((1L, 0.016393))
  }

  test("interArrival: same-user gaps attributed to the later event's type") {
    // one user at t=0(A), 10(B), 40(B): gaps 10->B, 30->B;
    // A has no predecessor-gap row
    val df = Seq(("A", 7L, 1L, new Timestamp(0L)),
      ("B", 7L, 2L, new Timestamp(10000L)),
      ("B", 7L, 3L, new Timestamp(40000L)))
      .toDF("event_type", "user_id", "event_id", "ts")
    val r = Events.interArrival(df).collect()
    r.length shouldBe 1
    r.head.getAs[String]("event_type") shouldBe "B"
    r.head.getAs[Long]("n_gaps") shouldBe 2L
    r.head.getAs[Double]("mean_gap_s") shouldBe 20.0
    r.head.getAs[Long]("median_gap_s") shouldBe 10L
    r.head.getAs[Long]("p90_gap_s") shouldBe 30L
  }

  test("histogramFixed: floor(x/width) bins with shares") {
    val df = Seq(("g", 10.0), ("g", 30.0), ("g", 55.0)).toDF("g", "x")
    val r = Profile.histogramFixed(df, "g", "x", width = 25.0)
      .collect().map(x => x.getAs[Long]("bin") ->
        (x.getAs[Double]("bin_lo"), x.getAs[Long]("n"),
          x.getAs[Double]("share"))).toMap
    r(0L) shouldBe ((0.0, 1L, 0.333333))
    r(1L) shouldBe ((25.0, 1L, 0.333333))
    r(2L) shouldBe ((50.0, 1L, 0.333333))
  }

  test("dowProfile: (epochDay+3)%7 puts 1970-01-01 on Thursday=3") {
    // two events on epoch day 0 (Thu -> dow 3), one on day 4 (Mon -> 0)
    val day = 86400000L
    val df = Seq(("X", new Timestamp(0L)), ("X", new Timestamp(1000L)),
      ("X", new Timestamp(4L * day))).toDF("event_type", "ts")
    val r = Events.dowProfile(df)
      .collect().map(x => x.getAs[Int]("dow") ->
        (x.getAs[Long]("n"), x.getAs[Double]("share"),
          x.getAs[Boolean]("is_peak"))).toMap
    r(3) shouldBe ((2L, 0.666667, true))
    r(0) shouldBe ((1L, 0.333333, false))
  }
}
