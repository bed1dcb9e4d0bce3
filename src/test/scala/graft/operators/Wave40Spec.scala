package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: l-diversity, Brier score, span token F1, label
  * cohesion. */
class Wave40Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("lDiversity: distinct sensitive values per class, at_risk " +
    "below l") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "y"), ("b", "z"),
      ("c", null.asInstanceOf[String]))
      .toDF("quasi", "sens")
    val out = Privacy.lDiversity(df, Seq("quasi"), "sens", l = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    out("a") shouldBe ((3L, 2L, true))
    out("b") shouldBe ((3L, 3L, false))
    out.contains("c") shouldBe false // null sensitive dropped
  }

  test("brierScore: integer squared-error sum over the raw grid") {
    // errs 0, 0, 25, 64 -> 89/(4*100) = 0.2225
    val df = Seq((10L, true), (0L, false), (5L, true), (8L, false))
      .toDF("raw", "y")
    val r = Eval.brierScore(df, "raw", maxRaw = 10L, "y")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2)) shouldBe
      ((4L, 2L, 0.2225))
  }

  test("spanTokenF1: multiset overlap, SQuAD empty conventions") {
    val df = Seq(
      (1L, "the cat sat", "the cat cat"), // overlap the+cat = 2
      (2L, "", ""),                       // both empty -> f1 1
      (3L, "a", ""))                      // one empty -> f1 0
      .toDF("id", "pred", "gold")
    val out = Eval.spanTokenF1(df, "id", "pred", "gold")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    out(1L) shouldBe ((3L, 3L, 2L, 0.666667, 0.666667, 0.666667))
    out(2L) shouldBe ((0L, 0L, 0L, 0.0, 0.0, 1.0))
    out(3L) shouldBe ((1L, 0L, 0L, 0.0, 0.0, 0.0))
  }

  test("labelCohesion: cosine to the label centroid") {
    val emb = Seq(
      (1L, Array(1f, 0f), "A"), (2L, Array(0f, 1f), "A"),
      (3L, Array(3f, 4f), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCohesion(emb, "vec_id", "embedding",
        "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // centroid A = (0.5, 0.5): cos = 0.5/sqrt(0.5) = 0.707107
    out(1L) shouldBe 0.707107
    out(2L) shouldBe 0.707107
    out(3L) shouldBe 1.0 // its own centroid
  }
}
