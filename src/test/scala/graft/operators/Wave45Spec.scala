package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-11 wave: generation-eval metrics (corpus BLEU, ROUGE-N). */
class Wave45Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("corpusBleu: hand-counted clipped sums, BP, geometric mean") {
    val df = Seq(
      (1L, "the cat sat on the mat", "the cat sat on a mat"),
      (2L, "", "hello")) // empty candidate still counts ref length
      .toDF("id", "cand", "ref")
    val r = Eval.corpusBleu(df, "id", "cand", "ref", maxN = 2)
      .collect().head
    // c_len=6, r_len=7; clipped1=5 (the|cat|sat|on|mat), ctotal1=6;
    // clipped2=3 (the cat|cat sat|sat on), ctotal2=5
    r.getLong(0) shouldBe 6L
    r.getLong(1) shouldBe 7L
    r.getDouble(2) shouldBe 0.833333 // p1 = 5/6
    r.getDouble(3) shouldBe 0.6      // p2 = 3/5
    val bp = math.exp(1.0 - 7.0 / 6.0)
    r.getDouble(4) shouldBe math.rint(bp * 1e6) / 1e6
    val bleu = bp * math.exp((math.log(5 / 6.0) + math.log(0.6)) / 2)
    r.getDouble(5) shouldBe math.rint(bleu * 1e6) / 1e6
  }

  test("corpusBleu: zero bigram overlap (or empty corpus) -> bleu 0") {
    val none = Seq((1L, "a b c", "x y z")).toDF("id", "cand", "ref")
    val r = Eval.corpusBleu(none, "id", "cand", "ref", maxN = 2)
      .collect().head
    (r.getDouble(3), r.getDouble(5)) shouldBe ((0.0, 0.0))
    val empty = Seq((1L, "", "")).toDF("id", "cand", "ref")
    val e = Eval.corpusBleu(empty, "id", "cand", "ref", maxN = 2)
      .collect().head
    (e.getLong(0), e.getDouble(4), e.getDouble(5)) shouldBe
      ((0L, 0.0, 0.0))
  }

  test("rougeN: clipped bigram overlap with span-F1 conventions") {
    val df = Seq(
      (1L, "the cat sat", "the cat ran"), // overlap "the cat" only
      (2L, "", ""),                       // gram-less both sides -> 1
      (3L, "x", "x"),                     // < n tokens == gram-less
      (4L, "a b", ""))                    // one-sided -> 0
      .toDF("id", "cand", "ref")
    val out = Eval.rougeN(df, "id", "cand", "ref", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    out(1L) shouldBe ((2L, 2L, 1L, 0.5, 0.5, 0.5))
    out(2L) shouldBe ((0L, 0L, 0L, 0.0, 0.0, 1.0))
    out(3L) shouldBe ((0L, 0L, 0L, 0.0, 0.0, 1.0))
    out(4L) shouldBe ((1L, 0L, 0L, 0.0, 0.0, 0.0))
  }

  test("winnowFingerprints: MOSS coverage guarantee + short-doc arms") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions.col
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 = w+k-1
    val df = Seq(
      (1L, s"one two $shared x y z"),
      (2L, s"$shared completely different tail words here"),
      (3L, "only three tokens"),        // < k=4 -> no fingerprints
      (4L, "exactly four tokens here")) // 1 shingle < w -> single min
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("text"), 4, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // guarantee: a shared >= w+k-1 token run shares a fingerprint
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(3L).isEmpty)
    assert(fps(4L).size == 1)
    // sorted distinct sets
    fps.values.foreach(s => assert(s == s.distinct.sorted))
  }

  test("rougeN clipping: candidate repetition cannot inflate precision") {
    // cand repeats "the the the" -> clipped to ref's single "the the"
    val df = Seq((1L, "the the the the", "the the"))
      .toDF("id", "cand", "ref")
    val r = Eval.rougeN(df, "id", "cand", "ref", n = 2).collect().head
    // cand bigrams: "the the" x3; ref: "the the" x1 -> overlap 1
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((3L, 1L, 1L))
    r.getDouble(4) shouldBe 0.333333 // precision clipped
  }
}
