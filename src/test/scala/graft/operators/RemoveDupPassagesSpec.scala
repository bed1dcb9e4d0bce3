package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RemoveDupPassagesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 3)
      : Map[Long, (String, Long, Long)] =
    Dedup.removeDupPassages(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("shared k-window is struck from BOTH docs, unique tails survive") {
    // docs share the 3-token run "x y z"; coverage spans exactly those
    // tokens in each doc
    val out = run(Seq(
      (1L, "a b x y z c"),
      (2L, "p x y z q r")))
    assert(out(1L) == (("a b c", 6L, 3L)))
    assert(out(2L) == (("p q r", 6L, 3L)))
  }

  test("within-doc repetition alone does not trigger removal") {
    // "x y z" repeats inside doc 1 but appears in no other doc —
    // the dupPassageStats >= 2 DISTINCT docs rule keeps it
    val out = run(Seq(
      (1L, "x y z x y z"),
      (2L, "totally different words here")))
    assert(out(1L) == (("x y z x y z", 6L, 0L)))
  }

  test("fully-duplicated docs empty out, short docs pass through") {
    val out = run(Seq(
      (1L, "x y z"),
      (2L, "x y z"),
      (3L, "a b"))) // shorter than k: no windows, untouched
    assert(out(1L) == (("", 3L, 3L)))
    assert(out(2L) == (("", 3L, 3L)))
    assert(out(3L) == (("a b", 2L, 0L)))
  }

  test("overlapping dup windows cover the union of their spans") {
    // docs share 4 consecutive tokens => two overlapping 3-windows;
    // covered = the union (4 tokens), not 6
    val out = run(Seq(
      (1L, "a w x y z b"),
      (2L, "c w x y z d")))
    assert(out(1L) == (("a b", 6L, 4L)))
    assert(out(2L) == (("c d", 6L, 4L)))
  }

  test("reassembly normalizes like the token contract: lowercase, " +
      "whitespace collapsed") {
    val out = run(Seq(
      (1L, "  A   B\tC  "),
      (2L, "unrelated content entirely")), k = 5)
    // no dups (k=5 > doc length): text survives, tokenized form
    assert(out(1L) == (("a b c", 3L, 0L)))
  }

  test("partition-invariant") {
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) s"common boiler plate text u$i"
          else s"unique words only for doc number u$i")
    }
    val a = Dedup.removeDupPassages(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().sorted
    val b = Dedup.removeDupPassages(
        docs.toDF("doc_id", "text").repartition(13), "doc_id", "text",
        k = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().sorted
    assert(a.toSeq == b.toSeq)
  }
}
