package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 47: Bradley-Terry ratings, URL category blocklist,
  * toxicity lexicon triage, Gale-Church bitext gate, split-conformal
  * thresholds, sample-ratio-mismatch, memorization risk. */
class Wave47Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("bradleyTerry: one hand-computed MM round, mean-1 invariant") {
    // A beats B twice plus one tie: w2_A=5, w2_B=1, g2=6 each side.
    // From p=1: raw_A = 5/(6/2) = 5/3, raw_B = 1/3; renormalized to
    // mean 1 that is exactly (5/3, 1/3).
    val battles = Seq(("A", "B", "a"), ("A", "B", "a"), ("A", "B", "tie"))
      .toDF("ma", "mb", "w")
    val r = Eval.bradleyTerry(battles, "ma", "mb", "w", iters = 1)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getInt(3)))).toMap
    r("A") shouldBe ((3L, 1.666667, 1))
    r("B") shouldBe ((3L, 0.333333, 2))
  }

  test("bradleyTerry: more iterations keep the order and the scale") {
    val battles = Seq(("A", "B", "a"), ("A", "C", "a"), ("B", "C", "b"),
      ("A", "B", "a"), ("C", "A", "b"), ("B", "C", "tie"))
      .toDF("ma", "mb", "w")
    val r = Eval.bradleyTerry(battles, "ma", "mb", "w", iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    // A is undefeated; C beats B once and half-ties the rematch
    r("A") should be > r("C")
    r("C") should be > r("B")
    // mean-1 renormalization: ratings sum to the model count at 6dp
    (r.values.sum) shouldBe 3.0 +- 1e-4
  }

  test("bradleyTerry: model-universe witness probe trips") {
    val battles = Seq(("A", "B", "a"), ("B", "C", "b")).toDF("ma", "mb", "w")
    an[IllegalArgumentException] should be thrownBy
      Eval.bradleyTerry(battles, "ma", "mb", "w", maxModels = 2)
  }

  test("urlBlocklistAudit: eTLD+1 lookup covers subdomains; " +
    "unlisted domains pass") {
    val df = Seq(
      (1L, "https://cdn.example.net/lib.js"),      // -> tracker
      (2L, "http://www.Example.ORG/a"),            // -> ads
      (3L, "https://safe-site.example/x"),         // unlisted
      (4L, "https://sub.shop.example.com.au/p"))   // -> shopping
      .toDF("id", "url")
    val out = Compliance.urlBlocklistAudit(df, "id", "url")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe (("tracker", true))
    out(2L) shouldBe (("ads", true))
    out(3L) shouldBe (("allowed", false))
    out(4L) shouldBe (("shopping", true))
    Compliance.filterUnblocked(df, "id", "url")
      .select("id").as[Long].collect().toSet shouldBe Set(3L)
  }

  test("toxicityScore: token-exact hits, no substring double-fire, " +
    "bigram entry counts once") {
    val df = Seq(
      (1L, "you stupid stupid loser"),   // sev 1+1+1=3 over 4 toks
      (2L, "hello world"),               // clean
      (3L, "hateful words"),             // 'hateful' (2), NOT 'hate'
      (4L, "please shut up now"))        // bigram, sev 1 over 4 toks
      .toDF("doc_id", "text")
    val out = TextQuality.toxicityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getString(5)))).toMap
    out(1L) shouldBe ((4L, 3L, 3L, 0.75, "high"))
    out(2L) shouldBe ((2L, 0L, 0L, 0.0, "none"))
    out(3L) shouldBe ((2L, 1L, 2L, 1.0, "high"))
    out(4L) shouldBe ((4L, 1L, 1L, 0.25, "high"))
  }

  test("bitextAlign: identical pair aligns; empty source never does; " +
    "garbled target fails on overlap") {
    val df = Seq(
      (1L, "the quick brown fox", "the quick brown fox"),
      (2L, "", "anything at all"),
      (3L, "the quick brown fox", "xof nworb kciuq eht"))
      .toDF("id", "src", "tgt")
    val out = Linkage.bitextAlign(df, "id", "src", "tgt")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    out(1L) shouldBe ((0.0, 1.0, true))
    out(2L)._3 shouldBe false
    out(3L)._1 shouldBe 0.0 // same length
    out(3L)._2 shouldBe 0.0 // no shared tokens
    out(3L)._3 shouldBe false
  }

  test("conformalSplit: order statistic, coverage, tiny-group drop") {
    val cal = (1 to 9).map(i => ("g", i.toLong, i.toDouble, "cal"))
    val test = Seq(("g", 100L, 5.0, "test"), ("g", 101L, 10.0, "test"))
    val tiny = Seq(("t", 200L, 1.0, "cal"), ("t", 201L, 2.0, "cal"),
      ("t", 202L, 3.0, "cal"))
    val df = (cal ++ test ++ tiny).toDF("g", "id", "score", "split")
    val rows = Stats.conformalSplit(df, "g", "id", "score", "split",
      alpha = 0.1).collect()
    rows.map(_.getString(0)).toSet shouldBe Set("g") // k=4 > n_cal=3 drops t
    val r = rows.head
    r.getLong(1) shouldBe 9L         // n_cal
    r.getLong(2) shouldBe 9L         // k = ceil(10 * 0.9)
    r.getDouble(3) shouldBe 9.0      // threshold = 9th smallest
    r.getLong(4) shouldBe 2L
    r.getDouble(5) shouldBe 0.5      // 5 <= 9 covered, 10 is not
  }

  test("srmCheck: hand-computed chi2 on a 40/60 split vs 50/50 design") {
    val df = (Seq.fill(40)("a") ++ Seq.fill(60)("b")).toDF("arm")
    val out = Stats.srmCheck(df, "arm", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5)))).toMap
    out("a") shouldBe ((40L, 50.0, 2.0, 4.0, 1L))
    out("b") shouldBe ((60L, 50.0, 2.0, 4.0, 1L))
  }

  test("srmCheck: missing arm reads as observed 0") {
    val df = Seq("a", "a").toDF("arm")
    val out = Stats.srmCheck(df, "arm", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out("b") shouldBe 0L
  }

  test("memorizationRisk: duplicated repetitive boilerplate flags; " +
    "unique prose does not") {
    val df = Seq(
      (1L, "x y x y"), (2L, "x y x y"),   // dup pair, rep 0.5
      (3L, "a b c d"))                    // unique
      .toDF("doc_id", "text")
    val out = Dedup.memorizationRisk(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4)))).toMap
    // ln(2) * (1 + 0.5) = 1.039721
    out(1L) shouldBe ((2L, 0.5, 1.039721, true))
    out(2L) shouldBe ((2L, 0.5, 1.039721, true))
    out(3L) shouldBe ((1L, 0.0, 0.0, false))
  }
}
