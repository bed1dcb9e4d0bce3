package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave 52: rejection-sampling yield, watermark detection,
  * truncation audit, normalization-merge audit. */
class Wave52Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("rejectionSamplingYield: pooled rates and expected tries") {
    val df = Seq(
      ("c", 1L, 9.0), ("c", 1L, 2.0),  // prompt 1: 1 of 2 pass
      ("c", 2L, 1.0), ("c", 2L, 3.0),  // prompt 2: none pass
      ("c", 3L, 8.0), ("c", 3L, 8.5))  // prompt 3: both pass
      .toDF("cfg", "prompt", "reward")
    val r = Eval.rejectionSamplingYield(df, "cfg", "prompt", "reward",
      threshold = 7.0).collect().head
    r.getLong(1) shouldBe 3L      // prompts
    r.getLong(2) shouldBe 6L      // samples
    r.getLong(3) shouldBe 3L      // passes
    r.getDouble(4) shouldBe 0.5
    r.getDouble(5) shouldBe 0.666667 // 2 of 3 prompts yield
    r.getDouble(6) shouldBe 2.0      // 6 / 3
  }

  test("watermarkZScore: an all-green run flags, natural text does not") {
    // 'delta omega token green list water tag seed' are all green for
    // salt wm1 (first md5 hex < '8'); 32 of them give z = sqrt(32) ~ 5.66
    val green = Array.fill(4)(
      "delta omega token green list water tag seed").mkString(" ")
    val df = Seq((1L, green), (2L, "")).toDF("doc_id", "text")
    val out = TextQuality.watermarkZScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    out(1L) shouldBe ((32L, 32L, 5.656854, true))
    out(2L) shouldBe ((0L, 0L, 0.0, false))
  }

  test("watermarkZScore: a half-green doc reads z = 0") {
    // 'alpha' and 'mark' are red for salt wm1
    val df = Seq((1L, "delta alpha omega mark")).toDF("doc_id", "text")
    val r = TextQuality.watermarkZScore(df, "doc_id", "text")
      .collect().head
    r.getLong(2) shouldBe 2L
    r.getDouble(3) shouldBe 0.0
  }

  test("truncationAudit: sentence-final (with trailing quotes) is " +
    "clean, mid-stream is truncated") {
    val df = Seq(
      ("m", "a full sentence."), ("m", "cut off in the middle of"),
      ("m", "quoted end!\""), ("m", "  "))
      .toDF("cfg", "completion")
    val r = TextQuality.truncationAudit(df, "cfg", "completion")
      .collect().head
    r.getLong(1) shouldBe 4L
    r.getLong(2) shouldBe 3L  // the blank completion is not counted
    r.getLong(3) shouldBe 2L
    r.getDouble(4) shouldBe 0.333333
  }

  test("normalizationMergeAudit: casing/spacing variants count as " +
    "merges, byte dups do not") {
    val df = Seq(
      (1L, "Hello World"), (2L, "hello   world"), // normalization merge
      (3L, "same bytes"), (4L, "same bytes"),     // byte-exact dup
      (5L, "unique"))
      .toDF("doc_id", "text")
    val r = Dedup.normalizationMergeAudit(df, "doc_id", "text")
      .collect().head
    r.getLong(0) shouldBe 3L // groups
    r.getLong(1) shouldBe 2L // dup groups
    r.getLong(2) shouldBe 1L // only the casing/spacing group merged
    r.getLong(3) shouldBe 2L
    r.getLong(4) shouldBe 2L
  }
}
