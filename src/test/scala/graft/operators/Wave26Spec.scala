package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-26: table fingerprints, novelty curve, pair-set
  * overlap metrics, feature gain scan. */
class Wave26Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("tableFingerprint: order-insensitive, dup-row sensitive") {
    val g1 = Seq(("g1", 1L, "x"), ("g1", 2L, "y"))
    val g2 = Seq(("g2", 2L, "y"), ("g2", 1L, "x")) // same rows, reversed
    val g3 = Seq(("g3", 1L, "x"), ("g3", 2L, "y"), ("g3", 2L, "y"))
    val df = (g1 ++ g2 ++ g3).toDF("g", "id", "s")
    val r = Profile.tableFingerprint(df, "g", Seq("id", "s"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    r("g1") shouldBe r("g2") // row order cannot matter
    r("g3")._1 shouldBe 3L
    r("g3")._2 shouldBe 2L // distinct rows
    r("g3")._3 should not be r("g1")._3 // the dup row flips the XOR
  }

  test("noveltyCurve: first-seen keys per day") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a")).toDF("day", "k")
    val r = Profile.noveltyCurve(df, "day", "k").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    r shouldBe Array((1L, 3L, 2L, 0.666667), (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0))
  }

  test("setOverlapMetrics: dedup, precision/recall/f1/jaccard") {
    val pred = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("a", "b") // dup row collapses
    val gold = Seq((1L, 2L), (4L, 5L)).toDF("a", "b")
    val r = Eval.setOverlapMetrics(pred, gold, Seq("a", "b"))
      .collect().head
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 1L
    r.getDouble(3) shouldBe 0.333333 // precision
    r.getDouble(4) shouldBe 0.5 // recall
    r.getDouble(5) shouldBe 0.4 // f1 = 2/5
    r.getDouble(6) shouldBe 0.25 // jaccard = 1/4
  }

  test("setOverlapMetrics: null keys match null-safely") {
    val pred = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    val gold = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    val r = Eval.setOverlapMetrics(pred, gold, Seq("a", "b"))
      .collect().head
    r.getLong(2) shouldBe 1L // n_both: the shared null-keyed row
    r.getDouble(3) shouldBe 1.0
    r.getDouble(4) shouldBe 1.0
  }

  test("featureGainScan: perfect feature nmi 1, constant feature 0") {
    val df = Seq(("p", true), ("p", true), ("q", false), ("q", false))
      .toDF("x", "t")
    val r = Stats.featureGainScan(df,
      Seq("const" -> lit(1), "same" -> col("x")), "t")
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("mi"), x.getAs[Double]("nmi"))).toMap
    r("same") shouldBe ((0.693147, 1.0))
    r("const") shouldBe ((0.0, 0.0))
  }
}
