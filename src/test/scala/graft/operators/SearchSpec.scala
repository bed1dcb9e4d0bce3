package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SearchSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine"), // tf=3, short doc
    (2L, "spark engine with many other words inside this longer text"),
    (3L, "totally unrelated content here"),
    (4L, "rare gem appears once")
  ).toDF("doc_id", "text")

  test("bm25 ranks high-tf short docs first, omits non-matching docs") {
    val got = Search.bm25TopK(docs, "doc_id", "text", "spark")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    got.map(_._1) shouldBe Array(1L, 2L) // docs 3,4 never match
    got(0)._2 should be > got(1)._2 // tf saturation still ranks 3 > 1
    got.foreach(_._2 should be > 0.0)
  }

  test("rarer terms contribute more (idf ordering)") {
    // "rare" appears in 1 doc, "spark" in 2: doc4's single rare hit must
    // outscore doc2's single spark hit (doc lengths comparable enough
    // that idf dominates)
    val got = Search.bm25TopK(docs, "doc_id", "text", "rare spark")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(4L) should be > got(2L)
    got(1L) should be > got(2L) // tf=3 spark beats tf=1 spark
  }

  test("hand-computed score for a one-term corpus hit") {
    // one doc, one term: N=1, df=1 -> idf = ln(0.5/1.5 + 1) = ln(4/3)
    // tf=1, dl=avgdl -> tf-part = (1*2.2)/(1 + 1.2) = 1
    val one = Seq((7L, "x")).toDF("doc_id", "text")
    val got = Search.bm25TopK(one, "doc_id", "text", "x")
      .collect().head.getDouble(1)
    got shouldBe (math.round(math.log(4.0 / 3.0) * 1e6) / 1e6) +- 1e-9
  }

  test("topK truncates after the rounded-score/id ordering") {
    Search.bm25TopK(docs, "doc_id", "text", "spark engine", topK = 1)
      .collect().map(_.getLong(0)) shouldBe Array(1L)
  }
}
