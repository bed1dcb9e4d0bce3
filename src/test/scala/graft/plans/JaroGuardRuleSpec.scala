package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.JaroWinklerExpr

class JaroGuardRuleSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private lazy val pairsPath: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-jaroguard").resolve("pairs").toString
    Seq(
      ("cold widget", "gold widget"),  // jw ~0.939
      ("martha", "marhta"),            // jw ~0.961
      ("ab", "abcdefghijklmnop"),      // ratio 2/16 -> guard kills it
      ("kitten", "sitting"),
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b").write.mode("overwrite").parquet(p)
    p
  }
  private def pairs = spark.read.parquet(pairsPath)
  private def jw = JaroWinklerExpr.jaroWinklerCol(col("a"), col("b"))

  test("rule injects the length-ratio guard for t > 0.8") {
    val opt = pairs.filter(jw >= 0.9)
      .queryExecution.optimizedPlan.toString().replaceAll("\\s+", "")
    opt should include("least")
    opt should include("greatest")
    opt should include("0.5") // 5*0.9 - 4
    opt should include("jarowinklerexpr")
  }

  test("no guard at or below the vacuous threshold 0.8") {
    val opt = pairs.filter(jw >= 0.75)
      .queryExecution.optimizedPlan.toString().replaceAll("\\s+", "")
    opt should not include "least"
  }

  test("guarded filter keeps exact semantics incl. nulls and the kill case") {
    val keep = pairs.filter(jw >= 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    keep shouldBe Set(
      ("cold widget", "gold widget"), ("martha", "marhta"))
    // soundness edge: the extreme-ratio pair really is below threshold
    JaroWinklerExpr.jaroWinkler("ab", "abcdefghijklmnop") should be < 0.9
  }

  test("idempotent under re-optimization (no stacked guards)") {
    val once = pairs.filter(jw >= 0.9).queryExecution.optimizedPlan
    val twice = JaroGuardRule(JaroGuardRule(once))
    twice.toString
      .sliding("least".length).count(_ == "least") shouldBe
      once.toString.sliding("least".length).count(_ == "least")
  }

  test("guard soundness: 5000 random pairs, guard never rejects a true match") {
    val rng = new scala.util.Random(11)
    (1 to 5000).foreach { _ =>
      val a = (1 to rng.nextInt(12)).map(_ =>
        ('a' + rng.nextInt(4)).toChar).mkString
      val b = (1 to rng.nextInt(12)).map(_ =>
        ('a' + rng.nextInt(4)).toChar).mkString
      val t = 0.81 + rng.nextDouble() * 0.18
      val s = JaroWinklerExpr.jaroWinkler(a, b)
      if (s >= t) {
        val (lo, hi) = (math.min(a.length, b.length),
          math.max(a.length, b.length))
        withClue(s"'$a' '$b' t=$t s=$s: ") {
          (lo.toDouble >= (5 * t - 4) * hi) shouldBe true
        }
      }
    }
  }

  test("jaro-winkler runs inside whole-stage codegen (not fallback)") {
    val plan = pairs.filter(jw >= 0.9)
      .queryExecution.executedPlan.toString
    // a CodegenFallback expression would break the codegen span around
    // the filter; the filter must sit under a WholeStageCodegen star
    plan should include("*(1)")
    plan should include("jarowinklerexpr")
  }
}
