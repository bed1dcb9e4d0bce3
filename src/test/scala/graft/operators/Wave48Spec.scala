package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 48: speculative-decode acceptance, cascade frontier,
  * DPO margins, RAG grounding coverage, KV-prefix sharing, Neyman
  * allocation. */
class Wave48Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("specDecodeStats: leading-accept semantics, hand-computed") {
    // step 1: accept, accept, reject -> lead 2 (3 tokens with bonus);
    // step 2: all accepted -> lead 3 (4 tokens)
    val df = Seq(
      ("c", 1L, 1, true), ("c", 1L, 2, true), ("c", 1L, 3, false),
      ("c", 2L, 1, true), ("c", 2L, 2, true), ("c", 2L, 3, true))
      .toDF("cfg", "step", "pos", "acc")
    val r = Eval.specDecodeStats(df, "cfg", "step", "pos", "acc", k = 3)
      .collect().head
    r.getLong(1) shouldBe 2L         // steps
    r.getLong(2) shouldBe 5L         // accepted draft tokens
    r.getDouble(3) shouldBe 3.5      // (5 + 2) / 2
    r.getDouble(4) shouldBe 0.833333 // 5 / 6
  }

  test("specDecodeStats: a rejected first draft still yields one token") {
    val df = Seq(("c", 1L, 1, false), ("c", 1L, 2, true))
      .toDF("cfg", "step", "pos", "acc")
    val r = Eval.specDecodeStats(df, "cfg", "step", "pos", "acc", k = 2)
      .collect().head
    r.getLong(2) shouldBe 0L    // lead 0: position 2's accept is moot
    r.getDouble(3) shouldBe 1.0 // the target's own sample
  }

  test("cascadeFrontier: hand-computed accuracy and cost at one cut") {
    val df = Seq(
      (0.1, false, true), (0.3, true, true),
      (0.5, false, false), (0.9, true, true))
      .toDF("conf", "so", "lo")
    val r = Eval.cascadeFrontier(df, "conf", "so", "lo",
      thresholds = Seq(0.4), largeCost = 10.0).collect().head
    r.getLong(1) shouldBe 4L   // n
    r.getLong(2) shouldBe 2L   // routed large (0.1, 0.3)
    r.getDouble(3) shouldBe 0.75 // large T,T + small F,T
    r.getDouble(4) shouldBe 5.5  // (2*1 + 2*10) / 4
  }

  test("dpoMarginStats: margins, win rate, big-margin rate") {
    val df = Seq(("g", 2.0, 1.0), ("g", 0.3, 0.5), ("g", 1.1, 0.5))
      .toDF("grp", "chosen", "rejected")
    val r = Eval.dpoMarginStats(df, "grp", "chosen", "rejected")
      .collect().head
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 0.466667 // (1.0 - 0.2 + 0.6) / 3
    r.getDouble(3) shouldBe 0.666667
    r.getDouble(4) shouldBe 0.666667 // 1.0 and 0.6 exceed 0.5
  }

  test("groundingCoverage: full, empty-answer, and unrelated contexts") {
    val df = Seq(
      (1L, "a b c d", "x a b c d e"),  // both answer trigrams present
      (2L, "a b", "a b c d"),          // answer too short to claim
      (3L, "a b c d", "q r s t u v"))  // nothing grounded
      .toDF("id", "ans", "ctx")
    val out = Eval.groundingCoverage(df, "id", "ans", "ctx", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    out(1L) shouldBe ((2L, 2L, 1.0, true))
    out(2L) shouldBe ((0L, 0L, 0.0, false))
    out(3L) shouldBe ((2L, 0L, 0.0, false))
  }

  test("prefixShareStats: shared prefix saves, short prompt keys whole") {
    val df = Seq((1L, "s p a b"), (2L, "s p a c"), (3L, "x y"))
      .toDF("id", "text")
    val r = Chunking.prefixShareStats(df, "id", "text",
      prefixLens = Seq(2)).collect().head
    r.getLong(1) shouldBe 3L  // prompts
    r.getLong(2) shouldBe 2L  // groups: "s p" and "x y"
    r.getLong(3) shouldBe 2L  // one extra member x prefix 2
    r.getDouble(4) shouldBe 0.2 // 2 saved of 10 total tokens
  }

  test("prefixShareStats: different short prompts never collide") {
    val df = Seq((1L, "x y"), (2L, "x z")).toDF("id", "text")
    val r = Chunking.prefixShareStats(df, "id", "text",
      prefixLens = Seq(4)).collect().head
    r.getLong(2) shouldBe 2L // two groups
    r.getLong(3) shouldBe 0L // nothing saved
  }

  test("neymanAllocation: noisy stratum takes the budget; " +
    "degenerate strata drop") {
    val df = (Seq(("a", 0.0), ("a", 10.0)) ++
      Seq.fill(3)(("b", 5.0)) ++ Seq(("c", 1.0))).toDF("s", "v")
    val out = Sampling.neymanAllocation(df, "s", "v", totalN = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    out.keySet shouldBe Set("a", "b") // "c" has n=1, no variance signal
    out("a") shouldBe ((2L, 7.071068, 1.0, 100L))
    out("b") shouldBe ((3L, 0.0, 0.0, 0L))
  }
}
