package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-13 fixes — the scale
  * properties the Scaladocs claim, pinned against silent plan
  * regressions (the PlanSpec discipline). */
class Round13PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withStaticPlan[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("media synthesis partitions by WORK, not bytes: a tiny ids " +
    "frame still fans out to the session's full parallelism") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id").as("media_id"))
    val parts = graft.multimodal.Multimodal.synthesizeAudio(ids)
      .rdd.getNumPartitions
    assert(parts >= spark.sparkContext.defaultParallelism,
      s"per-record encode must not serialize: $parts partitions < " +
        s"${spark.sparkContext.defaultParallelism} (the r13 sf1 finding: " +
        "a 5 MB parquet coalesced 50k CPU-bound syntheses onto one task)")
  }

  test("mannWhitney: every window ranks the grouped VALUE frame — " +
    "no no-partition window ever sees corpus rows") {
    withStaticPlan {
      val df = SparkEntry.queries("q_mann_whitney")(spark, dir)
      val wins = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, s"expected a value-frame window:\n${planOf(df)}")
      wins.foreach { w =>
        val aggBelow = w.child.collect {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            => a
        }
        assert(aggBelow.nonEmpty,
          "window input must be the groupBy(value) counts frame, " +
            s"not row-level events:\n${planOf(df)}")
      }
    }
  }
}
