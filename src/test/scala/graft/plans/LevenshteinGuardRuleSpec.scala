package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class LevenshteinGuardRuleSpec extends AnyFunSuite with Matchers
    with SparkSpec {
  import spark.implicits._

  // parquet round-trip: a Filter over a LocalRelation would be
  // constant-folded away by ConvertToLocalRelation (even below a
  // repartition) and leave no plan to inspect
  private lazy val pairsPath: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-levguard").resolve("pairs").toString
    Seq(
      ("cold widget", "gold widget"), // dist 1
      ("cold widget", "cold widget"), // dist 0
      ("abc", "abcdefgh"),            // length diff 5 -> guard kills it
      ("kitten", "sitting"),          // dist 3
      (null.asInstanceOf[String], "x") // null -> filtered on both paths
    ).toDF("a", "b").write.mode("overwrite").parquet(p)
    p
  }
  private def pairs = spark.read.parquet(pairsPath)

  test("rule rewrites lev(a,b) <= k to guard AND thresholded lev") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 1)
    val opt = q.queryExecution.optimizedPlan.toString()
    opt.toLowerCase should include("abs")
    opt should include("levenshtein(a#") // thresholded form keeps the name
    // the threshold literal must appear inside the levenshtein call
    opt.replaceAll("\\s+", "") should include regex "levenshtein\\(a#\\d+,b#\\d+,Some\\(1\\)\\)"
  }

  test("rewritten filter keeps exact batch semantics incl. nulls") {
    val keep = pairs.filter(levenshtein(col("a"), col("b")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    keep shouldBe Set(
      ("cold widget", "gold widget"), ("cold widget", "cold widget"))
  }

  test("all four comparison spellings rewrite") {
    def opt(c: org.apache.spark.sql.Column): String =
      pairs.filter(c).queryExecution.optimizedPlan.toString()
        .replaceAll("\\s+", "")
    val lev = levenshtein(col("a"), col("b"))
    opt(lev <= 2) should include regex "levenshtein\\(a#\\d+,b#\\d+,Some\\(2\\)\\)"
    opt(lev < 3) should include regex "levenshtein\\(a#\\d+,b#\\d+,Some\\(2\\)\\)"
    opt(lit(2) >= lev) should include regex "levenshtein\\(a#\\d+,b#\\d+,Some\\(2\\)\\)"
    opt(lit(3) > lev) should include regex "levenshtein\\(a#\\d+,b#\\d+,Some\\(2\\)\\)"
  }

  test("rule is idempotent (no stacked guards on a second pass)") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 1)
    val once = q.queryExecution.optimizedPlan
    val twice = LevenshteinGuardRule(once)
    twice.toString() shouldBe once.toString()
  }

  test("unbounded comparisons and non-literal bounds are untouched") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) >= 1)
    q.queryExecution.optimizedPlan.toString().toLowerCase should
      not include "abs"
    val q2 = pairs.filter(
      levenshtein(col("a"), col("b")) <=
        org.apache.spark.sql.functions.length(col("a")))
    q2.queryExecution.optimizedPlan.toString()
      .replaceAll("\\s+", "") should not include regex("levenshtein\\(a#\\d+,b#\\d+,Some\\(\\d")
  }

  test("fuzzyNamePairs picks up the guard through the projected column") {
    val df = Seq("cold widget", "gold widget", "x").toDF("p_name")
    val fp = graft.operators.Linkage.fuzzyNamePairs(df, "p_name")
    fp.queryExecution.optimizedPlan.toString()
      .toLowerCase should include("abs")
    fp.collect().map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("cold widget", "gold widget"))
  }
}
