package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 60: coverage curve, language purity, JSON field
  * stats. */
class Wave60Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("coverageCurve: hand counts — top-1 covers the mode's mass, " +
    "oversized cuts clamp to full coverage") {
    // tokens: a x5, b x3, c x2 -> total 10
    val df = Seq("a a a a a", "b b b c c").toDF("text")
    val r = TextQuality.coverageCurve(df, "text", Seq(1, 2, 99))
      .orderBy("rank_cut").collect()
    r.map(x => (x.getLong(0), x.getLong(2), x.getDouble(4))) shouldBe
      Array((1L, 5L, 0.5), (2L, 8L, 0.8), (99L, 10L, 1.0))
    all(r.map(_.getLong(1))) shouldBe 3L // n_types
  }

  test("langPurity: same-language halves read consistent; a stitched " +
    "bilingual doc does not") {
    val en = "the quick brown fox jumps over the lazy dog near the river"
    val fr = "le rapide renard brun saute par dessus le chien paresseux"
    val df = Seq((1L, en + " " + en), (2L, en + " " + fr))
      .toDF("id", "text")
    val r = TextQuality.langPurity(df, "id", "text")
      .orderBy("id").collect()
    r(0).getBoolean(3) shouldBe true
    r(0).getString(1) shouldBe "en"
    r(1).getBoolean(3) shouldBe false
    (r(1).getString(1), r(1).getString(2)) shouldBe (("en", "fr"))
  }

  test("jsonFieldStats: present/missing/malformed fields count " +
    "correctly") {
    val df = Seq(
      ("a", """{"k": 7}"""), ("a", """{"k": 3}"""),
      ("a", """{"other": 1}"""), // missing path
      ("b", "not json at all"), // malformed
      ("b", """{"k": 10}""")).toDF("g", "props")
    val r = Events.jsonFieldStats(df, "g", "props", "$.k")
      .orderBy("g").collect()
    (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) shouldBe ((3L, 2L, 10L, 7L))
    (r(1).getLong(1), r(1).getLong(2), r(1).getLong(3),
      r(1).getLong(4)) shouldBe ((2L, 1L, 10L, 10L))
  }
}
