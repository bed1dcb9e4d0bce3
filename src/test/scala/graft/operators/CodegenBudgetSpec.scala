package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CodegenProbe
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TextFunctions

/** Round-11 regression pins for the classifier-inside-a-fused-stage
  * pathology: the one-expression [[TextFunctions.qualityClassifier]]
  * re-derives the token array per feature, and its higher-order
  * lambdas are CodegenFallback — interpreted per OCCURRENCE — so
  * fusing it into the URL canonical chain re-traversed every row's
  * token array five times (measured 2.7 -> 10.2 s on
  * q_domain_quality_quota at sf0.1, restored to 2.4 s by the stepped
  * [[TextFunctions.withQualityScore]]). Pins, as numbers not timings:
  * float-identity, the bounded-recompute tree shape, and the fused
  * stage's generated-bytecode budget (Spark silently drops a stage to
  * interpreted eval past hugeMethodLimit — the plan string does not
  * change, so only a compile-probe can see it). */
class CodegenBudgetSpec extends AnyFunSuite with SparkSpec {

  private val HugeMethodLimit = 65535

  private def mkDf(n: Long) = {
    val id = col("id")
    val m = (id % 12).cast("int")
    spark.range(0, n).select(id.as("doc_id"),
      concat(lit("word one two the of and to a in seven eight nine "), id)
        .as("text"),
      when(m === 0, concat(lit("  HTTP://WWW.Example.COM:80/P/"), id,
        lit("?utm_source=x&id="), id, lit("#frag ")))
      .when(m === 1,
        concat(lit("https://User:S@News.Example.co.uk/a%2fB"), id))
      .when(m === 2,
        concat(lit("https://Example.org:443/"), id, lit("?fbclid=a")))
      .otherwise(concat(lit("https://www.example.com/item/"), id % 40))
      .as("url"))
  }

  private def quota(df: org.apache.spark.sql.DataFrame) =
    Urls.hostQuota(df, "doc_id", "url", "p_keep", 3)
      .select("doc_id", "registered_domain", "p_keep")

  test("withQualityScore is float-identical to qualityClassifier") {
    val base = mkDf(500)
    val one = base.select(col("doc_id"),
      TextFunctions.qualityClassifier(col("text")).as("p_keep"))
    val stepped = TextFunctions.withQualityScore(base, "text", "p_keep")
      .select("doc_id", "p_keep")
    assert(one.exceptAll(stepped).isEmpty &&
      stepped.exceptAll(one).isEmpty)
  }

  test("stepped form derives the token array once; one-expression " +
    "form re-derives it per feature") {
    def splits(df: org.apache.spark.sql.DataFrame): Int =
      "split\\(lower\\(trim\\(".r
        .findAllIn(df.queryExecution.optimizedPlan.toString).size
    val stepped = splits(quota(
      TextFunctions.withQualityScore(mkDf(100), "text", "p_keep")
        .select("doc_id", "url", "p_keep")))
    val oneExpr = splits(quota(
      mkDf(100).select(col("doc_id"), col("url"),
        TextFunctions.qualityClassifier(col("text")).as("p_keep"))))
    assert(stepped == 1,
      s"stepped quota plan derives the token split $stepped times")
    // the guard on the guard: if Catalyst ever learns to CSE the
    // repeated splits, the stepped form is merely equivalent and this
    // spec should be revisited
    assert(oneExpr >= 5,
      s"one-expression form now derives the split only $oneExpr times" +
        " — revisit (common-subexpression elimination arrived?)")
  }

  test("the fused classifier x canonical-chain stage stays inside the " +
    "silent hugeMethodLimit fallback budget") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val worst = CodegenProbe.maxMethodBytecode(quota(
        TextFunctions.withQualityScore(mkDf(100), "text", "p_keep")
          .select("doc_id", "url", "p_keep")))
      assert(worst > 0, "probe found no codegen stage at all")
      assert(worst <= HugeMethodLimit,
        s"fused quota stage over budget: $worst bytes — Spark would " +
          "silently run it interpreted")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("withQualityScore rejects reserved-column collisions") {
    import spark.implicits._
    val bad = Seq((1L, "x", 0.5)).toDF("doc_id", "text", "p_keep")
    val e = intercept[IllegalArgumentException] {
      TextFunctions.withQualityScore(bad, "text", "p_keep")
    }
    assert(e.getMessage.contains("p_keep"))
  }
}
