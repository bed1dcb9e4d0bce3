package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-9 operator waves —
  * the scale properties their designs claim, pinned against silent
  * plan regressions (the PlanSpec discipline). */
class Round9PlanSpec extends AnyFunSuite with SparkSpec {

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

  test("vocabCoverage: the vocab membership join BROADCASTS") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_vocab_coverage")(spark, dir))
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"vocab join did not broadcast:\n$plan")
    }
  }

  test("paretoFrontier: equi-join on (group, cost), never a theta join") {
    withStaticPlan {
      val df = SparkEntry.queries("q_pareto_frontier")(spark, dir)
      // distinct-cost collapse + ROWS cummax + equi-join back: a
      // bounded number of key exchanges, and NEVER the quadratic
      // dominance shape (nested-loop / cartesian over the rows)
      assert(exchanges(df) <= 3, s"${exchanges(df)} exchanges:\n" +
        planOf(df))
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"frontier must not be a dominance join:\n$plan")
    }
  }

  test("histogramQuantiles: no global sort anywhere") {
    withStaticPlan {
      val df = SparkEntry.queries("q_hist_quantiles")(spark, dir)
      val hasGlobalSort = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }.nonEmpty
      assert(!hasGlobalSort, "quantiles must not globally sort:\n" +
        planOf(df))
    }
  }

  test("changelogCompact: a single pair of hash aggregates, no window") {
    withStaticPlan {
      val df = SparkEntry.queries("q_changelog_compact")(spark, dir)
      val plan = planOf(df)
      assert(!plan.contains("Window"), s"unexpected window:\n$plan")
      assert(exchanges(df) == 1,
        s"expected exactly one key shuffle, got ${exchanges(df)}:\n$plan")
    }
  }

  test("chiSquare: marginals and totals broadcast into the cell join") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_chi_square")(spark, dir))
      assert(plan.contains("BroadcastHashJoin"),
        s"marginal joins did not broadcast:\n$plan")
    }
  }

  test("kmvDistinct: the rank trim compiles to WindowGroupLimit") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_kmv_distinct")(spark, dir))
      assert(plan.contains("WindowGroupLimit"),
        s"k-trim not pushed into WindowGroupLimit:\n$plan")
    }
  }

  test("interArrival: one user shuffle then one type shuffle") {
    withStaticPlan {
      val df = SparkEntry.queries("q_interarrival")(spark, dir)
      assert(exchanges(df) == 2,
        s"expected 2 exchanges (user window, type agg), got " +
          s"${exchanges(df)}:\n${planOf(df)}")
    }
  }

  test("gapFillDaily: spine explode never touches a row-sized frame") {
    withStaticPlan {
      val df = SparkEntry.queries("q_gap_fill")(spark, dir)
      val plan = planOf(df)
      // the Generate (explode) must sit above the days-sized aggregate,
      // not above the events scan
      val genIdx = plan.indexOf("Generate explode")
      assert(genIdx >= 0, s"no explode in:\n$plan")
      // plans print top-down: a HashAggregate AFTER the Generate in
      // the string is the explode's DESCENDANT — the days-sized span
      // aggregate the spine is built from, never the raw events scan
      assert(plan.indexOf("HashAggregate", genIdx) > genIdx,
        s"explode not fed by the span aggregate:\n$plan")
      assert(plan.contains("sequence("), s"no sequence spine:\n$plan")
    }
  }

  test("attribution: conv x touch is an EQUI join on the user key") {
    withStaticPlan {
      val df = SparkEntry.queries("q_attribution")(spark, dir)
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"attribution must join on the user key, not nested-loop:\n" +
          plan)
    }
  }

  test("geoNearest: the 3x3 candidate join is an EQUI join on cells") {
    withStaticPlan {
      val df = SparkEntry.queries("q_geo_nearest")(spark, dir)
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"grid join must be an equi join on the cell key:\n$plan")
    }
  }

  test("mutualInformation family: marginal joins BROADCAST") {
    withStaticPlan {
      val plan = planOf(SparkEntry.queries("q_mutual_info")(spark, dir))
      assert(plan.contains("BroadcastHashJoin"),
        s"MI marginals must broadcast back to the cell frame:\n$plan")
      assert(!plan.contains("Window"),
        s"MI must not ride a global window over the cell frame:\n$plan")
    }
  }

  test("groupedPercentiles: every window is PARTITIONED (no global)") {
    withStaticPlan {
      val df = SparkEntry.queries("q_group_percentiles")(spark, dir)
      val bad = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"unpartitioned window in grouped percentiles:\n${planOf(df)}")
    }
  }

  test("kaplanMeier: corpus reduces BEFORE the unpartitioned windows") {
    withStaticPlan {
      val df = SparkEntry.queries("q_kaplan_meier")(spark, dir)
      val plan = planOf(df)
      // the no-partition product-limit windows are legal ONLY on the
      // duration-cardinality frame: an aggregate must sit below them
      val winIdx = plan.indexOf("Window")
      assert(winIdx >= 0, s"no window in:\n$plan")
      assert(plan.indexOf("HashAggregate", winIdx) > winIdx,
        s"KM window not fed by the duration aggregate:\n$plan")
    }
  }

  test("tableFingerprint: one aggregate pass, no join, no window") {
    withStaticPlan {
      val df = SparkEntry.queries("q_table_fingerprint")(spark, dir)
      val plan = planOf(df)
      assert(!plan.contains("Join") && !plan.contains("Window"),
        s"fingerprint must be a single agg pass:\n$plan")
    }
  }
}
