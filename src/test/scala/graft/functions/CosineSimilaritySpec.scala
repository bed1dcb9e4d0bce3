package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CosineSimilaritySpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (Array(1.0f, 2.0f, 3.0f), Array(-3.0f, 0.5f, 2.0f)),
    (Array(0.1f, -0.2f, 0.3f), Array(0.4f, 0.5f, -0.6f))
  ).toDF("a", "b")

  test("native expression is bit-identical to the HOF formulation") {
    val hof = Similarity.dot(col("a"), col("b")) /
      (Similarity.norm(col("a")) * Similarity.norm(col("b")))
    val rows = pairs.select(
      CosineSimilarity.cosineSim(col("a"), col("b")).as("native"),
      hof.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
  }

  test("codegen path executes (no interpreter fallback)") {
    // CODEGEN_ONLY would throw on execution if doGenCode were broken
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val n = pairs.select(
        CosineSimilarity.cosineSim(col("a"), col("b")).as("c"))
        .filter(col("c") > -2.0).count()
      n shouldBe 4
    } finally spark.conf.set(key, prev)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    df.select(CosineSimilarity.cosineSim(col("a"), col("b")))
      .first().isNullAt(0) shouldBe true
  }
}
