package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFunctions

class DecontaminateSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely unrelated training text about spark engines"),
    (3L, "quick brown fox appears here too with extra words")
  ).toDF("doc_id", "text")

  // shares the 3-grams "the quick brown", "quick brown fox" with doc 1
  // and "quick brown fox" with doc 3
  private val benchmark = Seq(
    (100L, "the quick brown fox answered the benchmark question")
  ).toDF("doc_id", "text")

  test("overlapCounts counts distinct colliding n-grams per doc") {
    val got = Decontaminate.overlapCounts(corpus, benchmark,
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1: "the quick brown", "quick brown fox", "brown fox jumps"?
    // benchmark 3-grams: {the quick brown, quick brown fox,
    //   brown fox answered, fox answered the, answered the benchmark,
    //   the benchmark question}
    got(1L) shouldBe 2L
    got(3L) shouldBe 1L // "quick brown fox"
    got.get(2L) shouldBe None // clean doc: no row
  }

  test("decontaminate drops every doc with any collision by default") {
    Decontaminate.decontaminate(corpus, benchmark, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(2L)
  }

  test("maxOverlap tolerates bounded collisions") {
    Decontaminate.decontaminate(corpus, benchmark, "doc_id", "text",
        n = 3, maxOverlap = 1L)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 3L)
  }

  test("overlapFraction keeps zero-hit docs and matches overlapCounts") {
    val got = Decontaminate.overlapFraction(corpus, benchmark,
        "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc1 has 7 distinct 3-grams ("the quick brown" ... "the lazy dog"),
    // 2 of them in the benchmark set
    got(1L) shouldBe ((7L, 2L, BigDecimal(2.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    got(3L)._2 shouldBe 1L
    got(2L)._2 shouldBe 0L // clean doc keeps its row, frac 0
    got(2L)._3 shouldBe 0.0
    // n_overlap agrees with the any-hit operator wherever it reports
    val counts = Decontaminate.overlapCounts(corpus, benchmark,
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, c) => got(id)._2 shouldBe c }
  }
}

class PiiSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val rows = Seq(
    (1L, "contact alice.smith+work@example.co.uk for details"),
    (2L, "ssn 123-45-6789 leaked with host 10.0.255.3 today"),
    (3L, "call +1 (415) 555-0100 now"),
    (4L, "nothing sensitive here at all")
  ).toDF("doc_id", "text")

  test("piiCounts finds each planted class exactly once") {
    val (e, s, i, p) = TextFunctions.piiCounts(col("text"))
    val got = rows.select(col("doc_id"), e.as("e"), s.as("s"),
        i.as("i"), p.as("p"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    got(1L) shouldBe ((1, 0, 0, 0))
    got(2L) shouldBe ((0, 1, 1, 0))
    got(3L) shouldBe ((0, 0, 0, 1))
    got(4L) shouldBe ((0, 0, 0, 0))
  }

  test("numeric prose is NOT phone-matched (floats, number runs)") {
    // regression: a permissive digits-and-separators pattern swallowed
    // scientific/financial text into <PII>
    val clean = Seq(
      (1L, "pi is 3.14159 and e is 2.71828"),
      (2L, "revenue 1200 1300 1400 by quarter"),
      (3L, "version 10.2.33 released 2026-08-12")).toDF("doc_id", "text")
    val (e, s2, i, p) = TextFunctions.piiCounts(col("text"))
    val counts = clean.select(col("doc_id"), e + s2 + i + p)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts shouldBe Map(1L -> 0, 2L -> 0, 3L -> 0)
    clean.select(TextFunctions.redactPii(col("text")))
      .collect().map(_.getString(0))
      .foreach(_ should not include "<PII>")
  }

  test("redactPii removes every planted identifier") {
    val red = rows.select(col("doc_id"),
        TextFunctions.redactPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    red(1L) shouldBe "contact <PII> for details"
    red(2L) shouldBe "ssn <PII> leaked with host <PII> today"
    red(3L) shouldBe "call <PII> now"
    red(4L) shouldBe "nothing sensitive here at all"
    red.values.foreach { t =>
      t should not include "@"
      t should not include "123-45"
      t should not include "10.0.255"
      t should not include "555-0100"
    }
  }
}
