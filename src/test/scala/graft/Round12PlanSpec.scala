package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-12 wave 54-57
  * operators — the scale properties their Scaladocs claim, pinned
  * against silent plan regressions (the PlanSpec discipline). */
class Round12PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withStaticPlan[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        => e
    }.size

  test("map-only wave: unigram_count, readability, pii_scan, " +
    "fim_split ride the scan with zero exchanges") {
    withStaticPlan {
      for (q <- Seq("q_unigram_count", "q_readability", "q_pii_scan",
          "q_fim_split")) {
        val df = SparkEntry.queries(q)(spark, dir)
        assert(exchanges(df) == 0,
          s"$q must be map-only, got plan:\n${planOf(df)}")
      }
    }
  }

  test("nnGraph: the per-layer degree trim compiles to " +
    "WindowGroupLimit (map-side pre-trim)") {
    withStaticPlan {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val plan = planOf(graft.operators.Similarity.nnGraph(e))
      assert(plan.contains("WindowGroupLimit"),
        s"degree trim must pre-trim map-side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"bucket join must stay equi:\n$plan")
    }
  }

  test("exact_substr: gram join is an equi-join, never cartesian") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_exact_substr")(spark, dir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"suffix-bucket join must stay equi:\n$plan")
    }
  }

  test("pref_pairs: the k-way expansion is a prompt equi-self-join") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_pref_pairs")(spark, dir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"pair expansion must join on the prompt key:\n$plan")
    }
  }

  test("tokenBudget-family sibling: unigram trainer's seed cap is a " +
    "TakeOrdered (top-k), not a global sort") {
    withStaticPlan {
      // the seedSize cut inside train() is orderBy().limit(): Spark
      // must plan TakeOrderedAndProject, never a full Sort+collect
      val words = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS piece")
        .groupBy("piece").count()
        .orderBy(org.apache.spark.sql.functions.col("count").desc,
          org.apache.spark.sql.functions.col("piece"))
        .limit(100)
      val plan = planOf(words)
      assert(plan.contains("TakeOrdered"),
        s"seed cap must be top-k, got:\n$plan")
    }
  }

  test("embed quality h2h: the score join is an id equi-join with " +
    "no cartesian") {
    withStaticPlan {
      val plan = planOf(
        SparkEntry.queries("q_embed_quality_h2h")(spark, dir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"h2h must equi-join on the id:\n$plan")
    }
  }
}
