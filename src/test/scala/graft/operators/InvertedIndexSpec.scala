package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class InvertedIndexSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("invertedIndex: df is exact, postings sorted and comma-joined") {
    val df = Seq(
      (1L, "alpha beta"),
      (2L, "beta gamma beta"), // in-doc repeat counts once
      (3L, "beta")
    ).toDF("doc_id", "text")
    val out = Search.invertedIndex(df, "doc_id", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    out shouldBe Map(
      "alpha" -> (1L, "1"),
      "beta" -> (3L, "1,2,3"),
      "gamma" -> (1L, "2"))
  }

  test("invertedIndex: cap keeps the LOWEST ids, df stays full") {
    val df = (1L to 30L).map(i => (i, "tok")).toDF("doc_id", "text")
    val out = Search.invertedIndex(df, "doc_id", "text", cap = 5).collect()
    out should have length 1
    out.head.getLong(1) shouldBe 30L
    out.head.getString(2) shouldBe "1,2,3,4,5"
  }

  test("invertedIndex plan: rank filter compiles to WindowGroupLimit") {
    val df = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val plan = Search.invertedIndex(df, "doc_id", "text")
      .queryExecution.executedPlan.toString()
    plan should include("WindowGroupLimit")
  }
}
