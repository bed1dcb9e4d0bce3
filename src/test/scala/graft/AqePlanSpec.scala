package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** AQE-ON plan-shape assertions (the r6 verdict's ask): PlanSpec pins
  * the static shapes with adaptive execution disabled, but production
  * runs AQE on — these tests execute each load-bearing query under
  * `spark.sql.adaptive.enabled=true` and assert the shape holds in the
  * FINAL adaptive plan (AQE re-plans at stage boundaries, so only the
  * post-execution plan is evidence).
  */
class AqePlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withAqe[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try f finally spark.conf.set(key, prev)
  }

  /** Execute, then render the final adaptive plan. */
  private def finalPlanOf(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan
    val s = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
    assert(p.isInstanceOf[AdaptiveSparkPlanExec] ||
      p.toString.contains("AdaptiveSparkPlan"),
      s"query did not run adaptively:\n$p")
    s
  }

  test("AQE: cell-means grid join still broadcasts the tiny (g,t) grid") {
    withAqe {
      val plan = finalPlanOf(SparkEntry.queries("q_cell_means_2x2")(spark, dir))
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"grid join lost its broadcast under AQE:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    }
  }

  test("AQE: fuzzy linkage stays equi-join + guarded levenshtein") {
    withAqe {
      val plan = finalPlanOf(SparkEntry.queries("q_fuzzy_pairs")(spark, dir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        s"blocking equi-join degraded under AQE:\n$plan")
      // the session-wide optimizer rule must still fire with AQE's
      // re-optimization: threshold literal inside the levenshtein call
      assert(plan.contains("levenshtein") && plan.contains("Some(2)"),
        s"guard-rule rewrite lost under AQE re-planning:\n$plan")
    }
  }

  test("AQE: funnel still shuffles ONCE on the user key") {
    withAqe {
      val plan = finalPlanOf(SparkEntry.queries("q_funnel")(spark, dir))
      // AQE may wrap the exchange in a reused/coalesced-read form; the
      // invariant is one hash exchange, zero range exchanges
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
      assert(!plan.contains("Exchange rangepartitioning"),
        s"global sort leaked under AQE:\n$plan")
    }
  }

  test("AQE: per-domain cap keeps the WindowGroupLimit pre-trim") {
    withAqe {
      val plan = finalPlanOf(SparkEntry.queries("q_source_cap")(spark, dir))
      assert(plan.contains("WindowGroupLimit"),
        s"rank pre-trim lost under AQE:\n$plan")
    }
  }

  test("AQE: salted skew join — AQE's skew handling does not fight the salt") {
    withAqe {
      val df = SparkEntry.queries("q_skew_join")(spark, dir)
      val plan = finalPlanOf(df)
      // salting pre-splits hot keys; AQE's OptimizeSkewedJoin targets
      // sort-merge partitions post-hoc. They must compose: still a hash
      // equi-join on (key, salt), no nested loop / cartesian (the
      // replica fan-out rides the explicit broadcast), and the result
      // equals the AQE-off run bit-for-bit.
      assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"),
        s"salted join is not an equi-join under AQE:\n$plan")
      val aqeRows = df.collect().map(_.toString).sorted
      val offRows = {
        val key = "spark.sql.adaptive.enabled"
        spark.conf.set(key, "false")
        try SparkEntry.queries("q_skew_join")(spark, dir)
          .collect().map(_.toString).sorted
        finally spark.conf.set(key, "true")
      }
      assert(aqeRows.sameElements(offRows),
        "salted join result differs between AQE on and off")
    }
  }

  test("AQE: jaro linkage keeps the length-ratio guard (rule survives re-opt)") {
    withAqe {
      val plan = finalPlanOf(SparkEntry.queries("q_jaro_pairs")(spark, dir))
      assert(plan.contains("least(octet_length"),
        s"byte-length-ratio guard lost under AQE:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    }
  }

  test("AQE: ship-priority star join keeps dims broadcast, fact unshuffled-for-join") {
    withAqe {
      val plan = finalPlanOf(SparkEntry.queries("q_ship_priority")(spark, dir))
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
        s"fact-side shuffle join appeared under AQE:\n$plan")
    }
  }
}
