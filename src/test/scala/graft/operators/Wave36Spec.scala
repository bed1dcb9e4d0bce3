package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: LLM-eval metrics — retrieval ranking (MRR /
  * recall@k / NDCG@k), pass@k, pairwise win rates with Wilson CI,
  * Fleiss' multi-rater kappa. */
class Wave36Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("rankingMetrics: rr from first relevant, recall@k inside the " +
    "cutoff, NDCG@k vs the ideal ranking, no-rel query gets nulls") {
    // q1 ranked by (score desc): d1(rel0) d2(rel2) d3(rel0) d4(rel1)
    // d5(rel0); k=3
    //   rr = 1/2; recall@3 = 1/2
    //   DCG@3 = (2^2-1)/log2(3) = 1.8927892607
    //   IDCG@3 = 3/log2(2) + 1/log2(3) = 3.6309297536 -> ndcg .521296
    // q2 has no relevant docs: rr = 0, recall/ndcg null
    val runs = Seq(
      ("q1", "d1", 9.0, 0), ("q1", "d2", 8.0, 2), ("q1", "d3", 7.0, 0),
      ("q1", "d4", 6.0, 1), ("q1", "d5", 5.0, 0),
      ("q2", "d1", 9.0, 0), ("q2", "d2", 8.0, 0))
      .toDF("query", "doc", "score", "rel")
    val out = Eval.rankingMetrics(runs, "query", "doc", "score", "rel",
        k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val q1 = out("q1")
    q1.getLong(1) shouldBe 2L
    q1.getDouble(2) shouldBe 0.5
    q1.getDouble(3) shouldBe 0.5
    q1.getDouble(4) shouldBe 0.521296
    val q2 = out("q2")
    q2.getLong(1) shouldBe 0L
    q2.getDouble(2) shouldBe 0.0
    q2.isNullAt(3) shouldBe true
    q2.isNullAt(4) shouldBe true
  }

  test("rankingMetrics: score ties break by doc asc (deterministic)") {
    // equal scores: d1 before d2, so the rel=1 doc d2 ranks 2nd
    val runs = Seq(("q", "d1", 1.0, 0), ("q", "d2", 1.0, 1))
      .toDF("query", "doc", "score", "rel")
    val out = Eval.rankingMetrics(runs, "query", "doc", "score", "rel",
      k = 1).collect().head
    out.getDouble(2) shouldBe 0.5 // rr = 1/2
    out.getDouble(3) shouldBe 0.0 // recall@1 misses it
  }

  test("rankingMetrics: an ideally-ordered run scores ndcg 1 and " +
    "recall 1 at any covering k") {
    val runs = Seq(("q", "d1", 9.0, 3), ("q", "d2", 8.0, 2),
      ("q", "d3", 7.0, 1), ("q", "d4", 6.0, 0))
      .toDF("query", "doc", "score", "rel")
    val r = Eval.rankingMetrics(runs, "query", "doc", "score", "rel",
      k = 4).collect().head
    r.getDouble(2) shouldBe 1.0 // rr
    r.getDouble(3) shouldBe 1.0 // recall
    r.getDouble(4) shouldBe 1.0 // ndcg
  }

  test("passAtK: exact falling-factorial estimator; c=0 -> 0, " +
    "n-c<k -> 1, n<k dropped") {
    val df = Seq(("t1", 10, 3), ("t2", 5, 0), ("t3", 5, 1), ("t4", 4, 2))
      .toDF("task", "n", "c")
    val out = Eval.passAtK(df, "task", "n", "c", k = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // 1 - (7*6*5*4*3)/(10*9*8*7*6) = 1 - 2520/30240 = 11/12
    out("t1") shouldBe 0.916667
    out("t2") shouldBe 0.0
    out("t3") shouldBe 1.0 // any 5 of 5 samples must include the hit
    out.contains("t4") shouldBe false // n=4 < k
  }

  test("winRateWilson: ties are half points, CI matches the closed " +
    "form, both sides of each battle are credited") {
    val battles = Seq(("m1", "m2", "a"), ("m1", "m2", "b"),
      ("m1", "m3", "tie")).toDF("model_a", "model_b", "winner")
    val out = Eval.winRateWilson(battles, "model_a", "model_b",
        "winner")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    out("m1") shouldBe ((3L, 0.5, 0.125331, 0.874669))
    out("m2") shouldBe ((2L, 0.5, 0.094529, 0.905471))
    out("m3") shouldBe ((1L, 0.5, 0.054619, 0.945381))
  }

  test("fleissKappa: the integer-numerator formula on a hand grid") {
    // 4 items x 3 raters, cats A/B:
    //   AAA | AAB | BBB | ABB
    // P-bar = (6+2+6+2)/(4*3*2) = 2/3; cat totals 6/6 -> Pe = 1/2
    // kappa = (2/3 - 1/2)/(1/2) = 1/3
    val ratings = Seq(
      (1, 1, "A"), (1, 2, "A"), (1, 3, "A"),
      (2, 1, "A"), (2, 2, "A"), (2, 3, "B"),
      (3, 1, "B"), (3, 2, "B"), (3, 3, "B"),
      (4, 1, "A"), (4, 2, "B"), (4, 3, "B"))
      .toDF("item", "rater", "cat")
    val out = Eval.fleissKappa(ratings, "item", "rater", "cat")
      .collect().head
    out.getLong(0) shouldBe 4L
    out.getLong(1) shouldBe 3L
    out.getDouble(2) shouldBe 0.666667
    out.getDouble(3) shouldBe 0.5
    out.getDouble(4) shouldBe 0.333333
  }

  test("fleissKappa refuses a ragged rating grid, naming the counts") {
    val ragged = Seq((1, 1, "A"), (1, 2, "A"), (2, 1, "B"))
      .toDF("item", "rater", "cat")
    val e = intercept[IllegalArgumentException] {
      Eval.fleissKappa(ragged, "item", "rater", "cat").collect()
    }
    e.getMessage should include("same rater count")
  }
}
