package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class LexicalPairsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // 6 docs; "zebra" is rare (2 docs), everything else appears in >70%
  private val corpus = Seq(
    (1L, "the data table zebra join"),
    (2L, "the data table zebra join"),
    (3L, "the data table join merge"),
    (4L, "the data table join merge"),
    (5L, "the data table merge join"),
    (6L, "the data table merge join"))

  test("only rare-token-sharing pairs become candidates") {
    val out = Search.lexicalCosinePairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      maxDfFrac = 0.5, minCos = 0.0)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    // zebra (df 2 <= 0.5*6) links only docs 1-2; merge/join/the/... are
    // too common to generate candidates
    pairs.toSet shouldBe Set((1L, 2L))
  }

  test("cosine of identical docs is exactly 1") {
    val out = Search.lexicalCosinePairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      maxDfFrac = 0.5, minCos = 0.0).collect()
    out.head.getDouble(2) shouldBe 1.0
  }

  test("cosine matches the naive full-vocabulary tf-idf computation") {
    val docs = Seq(
      (1L, "rare common common alpha"),
      (2L, "rare common beta beta"),
      (3L, "common alpha beta"),
      (4L, "common alpha alpha"),
      (5L, "common beta alpha"))
    val out = Search.lexicalCosinePairs(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      maxDfFrac = 0.5, minCos = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // naive: idf = ln((N+1)/(df+1)) over full vocab, N=5
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val vocabDf = toks.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    def vec(id: Long): Map[String, Double] = {
      val ts = toks.find(_._1 == id).get._2
      ts.groupBy(identity).map { case (tok, occ) =>
        tok -> occ.size * math.log(6.0 / (vocabDf(tok) + 1.0))
      }
    }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vec(a), vec(b))
      val dot = va.keySet.intersect(vb.keySet)
        .toSeq.map(t => va(t) * vb(t)).sum
      val na = math.sqrt(va.values.map(x => x * x).sum)
      val nb = math.sqrt(vb.values.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // 'rare' df=2 <= 2.5 -> candidates (1,2) only
    out.keySet shouldBe Set((1L, 2L))
    out((1L, 2L)) shouldBe cos(1L, 2L) +- 1e-6
  }

  test("minCos threshold filters pairs") {
    val out = Search.lexicalCosinePairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      maxDfFrac = 0.5, minCos = 1.1)
    out.count() shouldBe 0L
  }

  test("maxDfAbs caps candidate fanout independently of the fraction") {
    val out = Search.lexicalCosinePairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      maxDfFrac = 0.5, minCos = 0.0, maxDfAbs = 1L)
    out.count() shouldBe 0L // zebra df=2 > 1 -> no candidates at all
  }
}
