package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class LinkagePrivacySpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("fuzzyNamePairs: near names in one block pair up with counts") {
    val df = Seq(
      "cold widget", "cold widget", "gold widget", // dist 1, same block
      "blue rod", "glue rod",                      // dist 1, same block
      "cold bolt"                                  // blocks alone
    ).toDF("p_name")
    val out = Linkage.fuzzyNamePairs(df, "p_name", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    out.toSet shouldBe Set(
      ("cold widget", "gold widget", 2L, 1L, 1L),
      ("blue rod", "glue rod", 1L, 1L, 1L))
  }

  test("fuzzyNamePairs: different blocks never compare, whatever the distance") {
    val df = Seq("cold rod", "cold rot").toDF("p_name") // dist 1, blocks differ
    Linkage.fuzzyNamePairs(df, "p_name").count() shouldBe 0L
  }

  test("fuzzyNamePairs: identical names collapse to one vocab row, no self-pair") {
    val df = Seq("cold widget", "cold widget").toDF("p_name")
    Linkage.fuzzyNamePairs(df, "p_name").count() shouldBe 0L
  }

  test("fuzzyNamePairs plan: equi-join on the block, no cartesian") {
    val df = Seq("cold widget", "gold widget").toDF("p_name")
    val plan = Linkage.fuzzyNamePairs(df, "p_name")
      .queryExecution.executedPlan.toString()
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("dpCounts: deterministic, bounded by the analytic Laplace tail") {
    val df = (1 to 100).map(i => s"src${i % 4}").toDF("source")
    val a = Privacy.dpCounts(df, "source", eps = 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = Privacy.dpCounts(df, "source", eps = 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    a shouldBe b // derandomized: identical across runs
    a.values.map(_._1).sum shouldBe 100L
    // |noise| = |ln(1-2|u-.5|)|/eps; u has 48 bits so the worst case
    // over 4 groups is astronomically unlikely to exceed ~35/eps, and
    // any finite bound proves the inverse CDF didn't blow up on u->0/1
    a.values.foreach { case (n, noisy) =>
      math.abs(noisy - n) should be < 40.0
    }
  }

  test("dpCounts: noise scales like 1/eps (same u, same sign)") {
    val df = (1 to 50).map(_ => "only").toDF("source")
    def noise(eps: Double): Double = {
      val r = Privacy.dpCounts(df, "source", eps = eps).collect().head
      r.getDouble(2) - r.getLong(1)
    }
    val n1 = noise(1.0)
    val n2 = noise(2.0)
    n1 should not be 0.0
    (n1 / n2) shouldBe (2.0 +- 1e-4) // 6dp rounding is the only slack
  }

  test("dpCounts: a NULL group key gets the sentinel's deterministic draw") {
    val df = Seq(Some("a"), Some("a"), None, None, None)
      .toDF("source")
    val out = Privacy.dpCounts(df, "source", eps = 1.0).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDouble(2))).toMap
    out.keySet shouldBe Set(Some("a"), None)
    out(None)._1 shouldBe 3L
    // the NULL group's draw equals the "__NULL__" sentinel's draw —
    // the documented replay contract (concat_ws would otherwise skip
    // the null and hash just "dp|")
    val sentinel = Privacy.dpCounts(
      Seq("__NULL__", "__NULL__", "__NULL__").toDF("source"),
      "source").collect().head
    (out(None)._2 - 3.0) shouldBe ((sentinel.getDouble(2) - 3.0) +- 1e-12)
    // and it is NOT the draw concat_ws's null-skipping would produce
    // (md5 of "dp|" alone differs from md5 of "dp|__NULL__")
  }

  test("dpCounts: different salts give different draws") {
    val df = (1 to 10).map(_ => "g").toDF("source")
    val d1 = Privacy.dpCounts(df, "source", salt = "dp").collect().head.getDouble(2)
    val d2 = Privacy.dpCounts(df, "source", salt = "dp2").collect().head.getDouble(2)
    d1 should not be d2
  }
}
