package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ChunkingSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int) =
    Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, overlap)
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)

  test("short document emits exactly one whole chunk") {
    chunks("a b c", size = 10, overlap = 2) shouldBe
      Array((0, 3, "a b c"))
  }

  test("overlapping windows share exactly `overlap` tokens") {
    val toks = (1 to 10).map(i => s"w$i").mkString(" ")
    chunks(toks, size = 4, overlap = 2) shouldBe Array(
      (0, 4, "w1 w2 w3 w4"),
      (1, 4, "w3 w4 w5 w6"),
      (2, 4, "w5 w6 w7 w8"),
      (3, 4, "w7 w8 w9 w10"))
  }

  test("a trailing remainder becomes a shorter final chunk") {
    val toks = (1 to 9).map(i => s"w$i").mkString(" ")
    chunks(toks, size = 4, overlap = 2) shouldBe Array(
      (0, 4, "w1 w2 w3 w4"),
      (1, 4, "w3 w4 w5 w6"),
      (2, 4, "w5 w6 w7 w8"),
      (3, 3, "w7 w8 w9")) // shares 2 with the previous, adds 1 new
  }

  test("no chunk fully contained in the previous (n barely past size)") {
    // n = 5, size = 4, overlap = 2, stride = 2: ceil(3/2) = 2 chunks
    chunks("a b c d e", size = 4, overlap = 2) shouldBe Array(
      (0, 4, "a b c d"),
      (1, 3, "c d e"))
  }

  test("empty and whitespace-only documents emit nothing") {
    Chunking.chunkTokens(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", 4, 1).count() shouldBe 0L
  }

  test("zero overlap partitions the tokens exactly") {
    val toks = (1 to 6).map(i => s"w$i").mkString(" ")
    chunks(toks, size = 2, overlap = 0).map(_._3) shouldBe
      Array("w1 w2", "w3 w4", "w5 w6")
  }

  test("invalid size/overlap rejected") {
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunkTokens(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", 4, 4)
  }

  private def packed(nBuckets: Int = 4, maxTokens: Int = 10) = {
    val docs = (1L to 30L)
      .map(i => (i, (1 to (3 + (i % 7)).toInt).map(k => s"d${i}w$k")
        .mkString(" ")))
      .toDF("doc_id", "text")
    Chunking.packSequences(
      Chunking.chunkTokens(docs, "doc_id", "text", size = 4, overlap = 0),
      "doc_id", "chunk_no", "n_tokens", maxTokens, nBuckets)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))
  }

  test("packSequences: concat-and-cut invariants hold per bucket") {
    val rows = packed()
    rows should not be empty
    // offsets stay inside the window; seq_id encodes its bucket
    rows.foreach { case (_, _, n, bucket, seqId, off) =>
      off should be >= 0
      off should be < 10
      (seqId >> 40).toInt shouldBe bucket
      n should be > 0
    }
    // within a bucket, cumulative layout: sorted by (seq_id, offset),
    // each chunk starts exactly where the previous one ended
    rows.groupBy(_._4).foreach { case (bucket, rs) =>
      val ordered = rs.sortBy(r => (r._5, r._6))
      ordered.head._5 shouldBe bucket.toLong << 40
      ordered.head._6 shouldBe 0
      ordered.sliding(2).foreach {
        case Array((_, _, n1, _, s1, o1), (_, _, _, _, s2, o2)) =>
          val globalEnd = (s1 & ((1L << 40) - 1)) * 10 + o1 + n1
          (s2 & ((1L << 40) - 1)) * 10 + o2 shouldBe globalEnd
        case _ =>
      }
    }
    // token mass is conserved (a pure relabeling, nothing dropped)
    rows.map(_._3).sum shouldBe
      (1L to 30L).map(i => 3 + (i % 7)).sum
  }

  test("packSequences is deterministic under repartitioning") {
    val a = packed().sortBy(r => (r._1, r._2)).toSeq
    val b = packed().sortBy(r => (r._1, r._2)).toSeq
    a shouldBe b
  }

  test("packSequences auto-derives bucket count from the token budget") {
    val docs = (1L to 30L)
      .map(i => (i, (1 to (3 + (i % 7)).toInt).map(k => s"d${i}w$k")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val ch = Chunking.chunkTokens(docs, "doc_id", "text",
      size = 4, overlap = 0)
    def run(nBuckets: Int, budget: Long) =
      Chunking.packSequences(ch, "doc_id", "chunk_no", "n_tokens",
        maxTokens = 10, nBuckets = nBuckets, maxBucketTokens = budget)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getInt(5)))
        .sortBy(r => (r._1, r._2)).toSeq
    // total token mass = 177, budget 5 => ceil(177/5) = 36 buckets,
    // above the local[4] parallelism floor — and the auto run is
    // IDENTICAL to explicitly passing the derived count
    val auto = run(nBuckets = 0, budget = 5)
    auto shouldBe run(nBuckets = 36, budget = 5)
    auto.map(_._4).distinct.size should be > 4
    // a roomy budget floors at cluster parallelism (local[4] => 4)
    run(nBuckets = 0, budget = 1L << 30) shouldBe
      run(nBuckets = 4, budget = 5)
    // namespace guard: bucket << 40 leaves 23 bits of bucket headroom
    an[IllegalArgumentException] should be thrownBy
      Chunking.packSequences(ch, "doc_id", "chunk_no", "n_tokens",
        maxTokens = 10, nBuckets = 1 << 23)
  }
}
