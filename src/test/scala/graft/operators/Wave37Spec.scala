package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: clustering silhouette, Unicode-script profile,
  * domain-mixture reweighting, top-n-gram repetition share. */
class Wave37Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("silhouetteExact: a/b are sqrt distances to own/nearest-other " +
    "centroid, sil = (b-a)/max(a,b)") {
    // iters=0 -> centroids are the 2 lowest-id vectors: (0,0), (4,0)
    val emb = Seq(
      (0L, Array(0f, 0f)), (1L, Array(4f, 0f)), (2L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.silhouetteExact(emb, "vec_id", "embedding",
        k = 2, iters = 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    out(0L) shouldBe ((0L, 0.0, 4.0, 1.0))
    out(1L) shouldBe ((1L, 0.0, 4.0, 1.0))
    // (1,0): d to c0 = 1, to c1 = 3 -> sil (3-1)/3
    out(2L) shouldBe ((0L, 1.0, 3.0, 0.666667))
  }

  test("silhouetteExact: coincident centroids give sil 0, not NaN") {
    val emb = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(2f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.silhouetteExact(emb, "vec_id", "embedding",
        k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    out(0L) shouldBe 0.0
    out(1L) shouldBe 0.0
  }

  test("scriptProfile: codepoint-range counts, priority-ordered " +
    "dominant, 'none' when nothing matches") {
    val df = Seq(
      (1L, "Hello Мир 123"), // latin 5, cyr 3, digit 3
      (2L, "ab12"),          // latin/digit tie -> latin (priority)
      (3L, "!!! ~~~"),       // none
      (4L, "你好"),           // cjk
      (5L, "αβγ"))           // greek
      .toDF("id", "text")
    val out = TextQuality.scriptProfile(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    r1.getLong(1) shouldBe 13L // n_chars
    r1.getLong(2) shouldBe 5L  // latin
    r1.getLong(3) shouldBe 3L  // cyrillic
    r1.getLong(7) shouldBe 3L  // digit
    r1.getString(8) shouldBe "latin"
    out(2L).getString(8) shouldBe "latin"
    out(3L).getString(8) shouldBe "none"
    out(4L).getString(8) shouldBe "cjk"
    out(4L).getLong(5) shouldBe 2L
    out(5L).getString(8) shouldBe "greek"
  }

  test("domainMixture: p = t/T, q = sqrt(t)/sum(sqrt), weight damps " +
    "the head and boosts the tail") {
    // tokens 9/16/25: T=50, sqrt sums 3+4+5=12
    val df = Seq(("a", 9L), ("b", 16L), ("c", 25L))
      .toDF("source", "tok")
    val out = Sampling.domainMixture(df, "source", "tok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    out("a") shouldBe ((9L, 0.18, 0.25, 1.388889))
    out("b") shouldBe ((16L, 0.32, 0.333333, 1.041667))
    out("c") shouldBe ((25L, 0.5, 0.416667, 0.833333))
  }

  test("topNgramShare: bigram counts, lexicographic tie-break, " +
    "sub-n docs dropped") {
    val df = Seq((1L, "a b a b a"), (2L, "solo"))
      .toDF("id", "text")
    val out = TextQuality.topNgramShare(df, "id", "text", n = 2)
      .collect()
    out.length shouldBe 1
    val r = out.head
    r.getLong(0) shouldBe 1L
    r.getLong(1) shouldBe 4L          // 4 bigrams
    r.getString(2) shouldBe "a b"     // ties 2-2 -> lex smaller
    r.getLong(3) shouldBe 2L
    r.getDouble(4) shouldBe 0.5
  }
}
