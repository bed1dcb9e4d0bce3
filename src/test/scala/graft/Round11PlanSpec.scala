package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-11 wave 47-51
  * operators — the scale properties their Scaladocs claim, pinned
  * against silent plan regressions (the PlanSpec discipline). */
class Round11PlanSpec extends AnyFunSuite with SparkSpec {

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

  test("poisonLift: the top-k rank pre-trims via WindowGroupLimit") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_poison_scan")(spark, dir))
      assert(plan.contains("WindowGroupLimit"),
        s"poison top-k must pre-trim map-side:\n$plan")
    }
  }

  test("toxicityScore: the lexicon join BROADCASTS (hits-only shuffle)") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_toxicity_score")(spark, dir))
      assert(plan.contains("BroadcastHashJoin"),
        s"lexicon join did not broadcast:\n$plan")
    }
  }

  test("cascadeFrontier: threshold fan-out collapses in a partial " +
    "aggregate — one shuffle, thresholds-sized") {
    withStaticPlan {
      val df = SparkEntry.queries("q_cascade_frontier")(spark, dir)
      assert(exchanges(df) == 1,
        s"expected one key shuffle, got ${exchanges(df)}:\n${planOf(df)}")
    }
  }

  test("specDecodeStats: two hash aggregates, never a sort or window") {
    withStaticPlan {
      val df = SparkEntry.queries("q_spec_decode")(spark, dir)
      val plan = planOf(df)
      assert(!plan.contains("Window"), s"unexpected window:\n$plan")
      val hasSort = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.nonEmpty
      assert(!hasSort, s"leading-accept must come from min(), " +
        s"not a sort:\n$plan")
    }
  }

  test("groundingCoverage: map-only — ZERO exchanges") {
    withStaticPlan {
      val df = SparkEntry.queries("q_grounding")(spark, dir)
      assert(exchanges(df) == 0,
        s"grounding must ride the scan, got ${exchanges(df)} " +
          s"exchanges:\n${planOf(df)}")
    }
  }

  test("secretScan: map-only — ZERO exchanges") {
    withStaticPlan {
      val df = SparkEntry.queries("q_secret_scan")(spark, dir)
      assert(exchanges(df) == 0,
        s"secret scan must ride the scan:\n${planOf(df)}")
    }
  }

  test("bitextAlign: map-only — ZERO exchanges") {
    withStaticPlan {
      val df = SparkEntry.queries("q_bitext_align")(spark, dir)
      assert(exchanges(df) == 0,
        s"bitext gate must ride the scan:\n${planOf(df)}")
    }
  }

  test("memorizationRisk: exactly the exactGroups shape — the md5 " +
    "aggregate plus the fingerprint join, text never shuffles") {
    withStaticPlan {
      val df = SparkEntry.queries("q_memorization_risk")(spark, dir)
      val plan = planOf(df)
      // the shuffled columns are the 32-char fp + counts, never text
      assert(!plan.matches("(?s).*Exchange hashpartitioning\\(text.*"),
        s"document text must not be a shuffle key:\n$plan")
      assert(exchanges(df) <= 3,
        s"got ${exchanges(df)} exchanges:\n$plan")
    }
  }

  test("srmCheck + mcnemar: integral corpus aggregates, no join back " +
    "to the event log") {
    withStaticPlan {
      for (q <- Seq("q_srm_check", "q_mcnemar")) {
        val df = SparkEntry.queries(q)(spark, dir)
        val plan = planOf(df)
        assert(!plan.contains("SortMergeJoin"),
          s"$q must not sort-merge join:\n$plan")
      }
    }
  }

  test("bhCorrect: the only windows run on the tests-sized frame " +
    "AFTER the distinct collapse") {
    withStaticPlan {
      val df = SparkEntry.queries("q_bh_fdr")(spark, dir)
      val plan = planOf(df)
      // the distinct (HashAggregate pair) must sit BELOW the windows
      val firstWindow = plan.indexOf("Window")
      val lastAgg = plan.lastIndexOf("HashAggregate")
      assert(firstWindow >= 0 && lastAgg > firstWindow,
        s"windows must consume the collapsed tests frame:\n$plan")
    }
  }

  test("sprtDecision: one window pass per experiment partition, " +
    "no global sort") {
    withStaticPlan {
      val df = SparkEntry.queries("q_sprt")(spark, dir)
      val hasGlobalSort = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }.nonEmpty
      assert(!hasGlobalSort,
        s"SPRT walk must not globally sort:\n${planOf(df)}")
    }
  }

  test("prefixShareStats: grouping keys are md5 digests, the prompt " +
    "text never shuffles") {
    withStaticPlan {
      val df = SparkEntry.queries("q_prefix_share")(spark, dir)
      val plan = planOf(df)
      assert(!plan.matches("(?s).*Exchange hashpartitioning\\(text.*"),
        s"prompt text must not be a shuffle key:\n$plan")
    }
  }
}
