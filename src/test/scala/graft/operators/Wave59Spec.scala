package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 59: successive-halving replay and RRF fusion. */
class Wave59Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("successiveHalving: 4 -> 2 -> 1 schedule promotes by metric, " +
    "champion is the final survivor") {
    // rung 0: c1=40, c2=30, c3=20, c4=10 -> keep {c1, c2}
    // rung 1: c1=5, c2=9 -> keep {c2}; rung 2: c2=7 champion
    val log = Seq(
      ("c1", 0L, 40.0), ("c2", 0L, 30.0), ("c3", 0L, 20.0),
      ("c4", 0L, 10.0),
      ("c1", 1L, 5.0), ("c2", 1L, 9.0),
      ("c2", 2L, 7.0)).toDF("config", "rung", "metric")
    val r = Eval.successiveHalving(log, "config", "rung", "metric")
      .orderBy("config").collect()
    r.length shouldBe 4
    val byCfg = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(3), x.getBoolean(4))).toMap
    byCfg("c2") shouldBe ((2L, 3L, true))
    byCfg("c1") shouldBe ((1L, 2L, false))
    byCfg("c3") shouldBe ((0L, 1L, false))
    byCfg("c4") shouldBe ((0L, 1L, false))
  }

  test("successiveHalving: promoted config missing its next-rung " +
    "metric trips the probe") {
    val log = Seq(("c1", 0L, 2.0), ("c2", 0L, 1.0), ("c2", 1L, 5.0))
      .toDF("config", "rung", "metric")
    // c1 promotes (top ceil(2/2)=1) but has no rung-1 metric
    intercept[IllegalArgumentException] {
      Eval.successiveHalving(log, "config", "rung", "metric")
    }.getMessage should include("incomplete sweep log")
  }

  test("successiveHalving: duplicate (config, rung) trips the probe") {
    val log = Seq(("c1", 0L, 1.0), ("c1", 0L, 2.0))
      .toDF("config", "rung", "metric")
    intercept[IllegalArgumentException] {
      Eval.successiveHalving(log, "config", "rung", "metric")
    }.getMessage should include("duplicate")
  }

  test("rrfFusion: hand scores — agreement ranks first") {
    // doc A: rank 1 in both -> 2/61; doc B: rank 2 + rank 3
    // -> 1/62+1/63; doc C only in run A at rank 3 -> 1/63
    val ra = Seq(("q", "A", 1L), ("q", "B", 2L), ("q", "C", 3L))
      .toDF("query", "doc", "rank")
    val rb = Seq(("q", "A", 1L), ("q", "B", 3L))
      .toDF("query", "doc", "rank")
    val r = Eval.rrfFusion(ra, rb, "query", "doc", "rank")
      .orderBy("fused_rank").collect()
    r.map(_.getString(1)) shouldBe Array("A", "B", "C")
    r(0).getDouble(2) shouldBe (2.0 / 61) +- 1e-6
    r(1).getDouble(2) shouldBe (1.0 / 62 + 1.0 / 63) +- 1e-6
    r(2).getDouble(2) shouldBe (1.0 / 63) +- 1e-6
  }

  test("rrfFusion: topN caps the fused list per query") {
    val ra = (1 to 50).map(i => ("q", s"d$i", i.toLong))
      .toDF("query", "doc", "rank")
    Eval.rrfFusion(ra, ra, "query", "doc", "rank", topN = 5)
      .count() shouldBe 5
  }
}
