package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 46: chrF, distinct-n, hard negatives, matryoshka
  * truncation eval, span-corruption prep, media routing, Kendall
  * tau-b. */
class Wave46Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("corpusChrF: hand-counted char-gram sums and beta=2 combine") {
    // cand "abc", ref "abd" (whitespace stripped): 1-grams overlap
    // a,b = 2 of 3; 2-grams overlap "ab" = 1 of 2; 3-grams 0 of 1
    val df = Seq((1L, "a bc", "ab d")).toDF("id", "cand", "ref")
    val r = Eval.corpusChrF(df, "id", "cand", "ref", maxN = 3)
      .collect().head
    r.getDouble(0) shouldBe 0.666667 // p1
    r.getDouble(1) shouldBe 0.666667 // r1
    r.getDouble(2) shouldBe 0.5      // p2
    r.getDouble(3) shouldBe 0.5      // r2
    r.getDouble(4) shouldBe 0.0      // p3
    val p = 2.0 / 3
    val f1 = 5.0 * p * p / (4.0 * p + p)
    val f2 = 5.0 * 0.5 * 0.5 / (4.0 * 0.5 + 0.5)
    r.getDouble(6) shouldBe
      math.rint(((f1 + f2) + 0.0) / 3 * 1e6) / 1e6 // chrf
  }

  test("distinctNgrams: repetition craters distinct-2") {
    val df = Seq(
      ("rep", "go go go go"),  // 4 unigrams 1 uniq; 3 bigrams 1 uniq
      ("div", "a b c d"))      // all distinct
      .toDF("source", "text")
    val out = Eval.distinctNgrams(df, "source", "text", maxN = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    out("rep") shouldBe ((4L, 1L, 0.25, 3L, 1L, 0.333333))
    out("div") shouldBe ((4L, 4L, 1.0, 3L, 3L, 1.0))
  }

  test("hardNegatives: same-label vectors never surface") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.99f, 0.1f), 0), // same label
      (3L, Array(0.9f, 0.3f), 1), (4L, Array(0f, 1f), 1),
      (5L, Array(0.8f, 0.5f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb,
        emb.filter(col("vec_id") === 1), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // nearest to (1,0) overall is vec 2, but it shares label 0:
    // hard negatives must be 3 then 5
    out.toSeq shouldBe Seq((1L, 3L), (1L, 5L))
  }

  test("matryoshkaEval: truncDim = full dim reproduces cos_full, " +
    "pair set equals bruteForceTopK") {
    val emb = (1L to 8L).map(i =>
      (i, Array.tabulate(6)(d => ((i * 7 + d * 3) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") <= 2)
    val full = Similarity.matryoshkaEval(emb, q, k = 3, truncDim = 6)
      .collect()
    full.foreach(r => r.getDouble(2) shouldBe r.getDouble(3))
    val pairs = Similarity.bruteForceTopK(emb, q, k = 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    full.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe pairs
  }

  test("spanCorruptionStats: deterministic, invariant-consistent") {
    val df = Seq((1L, "one two three four five six seven eight"),
      (2L, ""), (3L, "lonely")).toDF("doc_id", "text")
    val a = Chunking.spanCorruptionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = Chunking.spanCorruptionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    a.toSeq shouldBe b.toSeq // the md5 coin is a pure function
    a.foreach { r =>
      val (n, m, s, in, tg) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(s <= m && m <= n, r.toString) // spans <= masked <= tokens
      in shouldBe n - m + s
      tg shouldBe m + s
    }
    a(1).getLong(1) shouldBe 0L // empty doc -> all zeros
    // a 99% coin masks nearly everything into few spans
    val heavy = Chunking.spanCorruptionStats(df, "doc_id", "text", 99)
      .filter(col("doc_id") === 1).collect().head
    assert(heavy.getLong(2) >= 7L && heavy.getLong(3) <= 2L)
  }

  test("mediaRoute: extension table") {
    val cases = Seq(
      "https://a.example.com/x/photo.jpg" -> "image",
      "https://a.example.com/clip.MP4" -> "video",
      "https://a.example.com/lib/app.min.js" -> "script",
      "https://a.example.com/doc/spec.pdf" -> "document",
      "https://a.example.com/data/feed.json" -> "data",
      "https://a.example.com/index.html" -> "page",
      "https://a.example.com/about" -> "page",
      "https://a.example.com/w.xyzzy" -> "other")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Urls.mediaRoute(col("u")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => got(u) shouldBe want }
  }

  test("kendallTauB: hand cases with and without ties") {
    val noTies = Seq((1, 1.0, 1.0), (1, 2.0, 3.0), (1, 3.0, 2.0),
      (1, 4.0, 4.0)).map { case (g, x, y) => (g, x, y) }
      .zipWithIndex.map { case ((g, x, y), i) => (g, i.toLong, x, y) }
      .toDF("g", "id", "x", "y")
    val r1 = Stats.kendallTauB(noTies, "g", "id", "x", "y")
      .collect().head
    (r1.getLong(1), r1.getLong(2), r1.getLong(3)) shouldBe ((6L, 5L, 1L))
    r1.getDouble(6) shouldBe 0.666667
    val ties = Seq((1L, 1.0, 1.0), (2L, 1.0, 2.0), (3L, 2.0, 2.0))
      .map { case (i, x, y) => ("g", i, x, y) }.toDF("g", "id", "x", "y")
    val r2 = Stats.kendallTauB(ties, "g", "id", "x", "y").collect().head
    (r2.getLong(1), r2.getLong(2), r2.getLong(3), r2.getLong(4),
      r2.getLong(5)) shouldBe ((3L, 1L, 0L, 1L, 1L))
    r2.getDouble(6) shouldBe 0.5
  }

  test("kendallTauB: enforced group cap fails loudly") {
    val big = (1 to 50).map(i => ("g", i.toLong, i.toDouble, i.toDouble))
      .toDF("g", "id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Stats.kendallTauB(big, "g", "id", "x", "y", maxPerGroup = 10)
        .collect()
    }
    e.getMessage should include("maxPerGroup")
  }
}
