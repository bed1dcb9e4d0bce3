package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.streaming.{AnomalyEvent, StreamingOps}

/** Round-9 wave: the ENFORCED scale bounds the r8 verdict asked for —
  * the graph wedge family's hub-degree cap, the Mann-Kendall
  * series-length fail-fast, and the streaming-anomaly batch-mode
  * key-cardinality fail-fast. Bounds are code, not docs (the Linkage
  * maxBlock precedent), so each one gets a spec proving it trips. */
class Wave9Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // hub 1 touches 2..8 (degree 7); (2,3) and (7,8) close two
  // triangles THROUGH the hub: (1,2,3) and (1,7,8)
  private val hubEdges =
    (2L to 8L).map(i => (1L, i)) ++ Seq((2L, 3L), (7L, 8L))

  test("hub-degree cap: uncapped graph counts both hub triangles") {
    val out = Graph.triangleCounts(hubEdges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 8L -> 1L)
  }

  test("hub-degree cap: an over-cap hub keeps its lowest-id neighbors") {
    // maxDegree=4: hub 1 keeps edges to 2,3,4,5 — triangle (1,7,8) is
    // severed (its hub edges are past the cap), triangle (1,2,3)
    // survives intact; the (7,8) edge itself survives (both endpoints
    // are under the cap once the hub edges are gone)
    val out = Graph.triangleCounts(hubEdges.toDF("id_a", "id_b"),
        maxDegree = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    // the exact→approximate transition is visible to CODE, not just
    // stderr: the witness names the cap and the trimmed hub
    Graph.lastHubCapTruncation shouldBe Some((4, Seq((1L, 7L))))
  }

  test("hub-degree cap witness resets to None on an exact run") {
    Graph.triangleCounts(hubEdges.toDF("id_a", "id_b"), maxDegree = 4)
      .collect()
    Graph.lastHubCapTruncation.isDefined shouldBe true
    Graph.triangleCounts(hubEdges.toDF("id_a", "id_b")).collect()
    Graph.lastHubCapTruncation shouldBe None
  }

  test("hub-degree cap: post-cap wedge volume is bounded on kTruss too") {
    // same graph through kTruss (k=3 keeps any edge in >=1 triangle):
    // uncapped, both triangles' six edges survive; capped at 4, only
    // the (1,2,3) triangle's three edges do
    val full = Graph.kTruss(hubEdges.toDF("id_a", "id_b"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    full shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 7L), (1L, 8L), (7L, 8L))
    val capped = Graph.kTruss(hubEdges.toDF("id_a", "id_b"), k = 3,
        maxDegree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
  }

  test("hub-degree cap: sub-cap graphs are returned exact") {
    // the same graph with the cap exactly at the hub degree — no
    // truncation, identical to the uncapped run
    val out = Graph.triangleCounts(hubEdges.toDF("id_a", "id_b"),
        maxDegree = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 8L -> 1L)
  }

  test("wedge-family default hub cap is the MEASURED 2000") {
    // r9 verdict #4: 10000 admitted 10^8 wedges per hub at default;
    // 2000 is the value the straddling-hub rehearsal measured the win
    // at (30.7 s -> 6.4 s). Dense trusted graphs opt UP explicitly.
    Graph.DefaultMaxDegree shouldBe 2000
  }

  test("dowOf: one shared engine-neutral convention, 0=Monday, " +
    "pre-1970-safe") {
    // epoch day 0 = Thursday 1970-01-01 -> dow 3; day 4 = Monday ->
    // 0; day 10 = Sunday -> 6; day -1 = Wednesday -> 2 (naive
    // (d+3)%7 gives -5 there); day -7 = Thursday -> 3
    val out = Seq(0L, 4L, 10L, -1L, -7L).toDF("d")
      .select(Temporal.dowOf(org.apache.spark.sql.functions.col("d"))
        .as("dow"))
      .collect().map(_.getInt(0)).toSeq
    out shouldBe Seq(3, 0, 6, 2, 3)
  }

  test("mannKendall fails fast past maxSeriesLen, names the fix") {
    val long = (1 to 11).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "t", "x")
    val ex = intercept[IllegalArgumentException] {
      Stats.mannKendall(long, "g", "t", "x", maxSeriesLen = 10)
    }
    ex.getMessage should include("quadratic")
    ex.getMessage should include("bucket")
    // at the boundary the test runs normally
    Stats.mannKendall(long, "g", "t", "x", maxSeriesLen = 11)
      .collect().length shouldBe 1
  }

  test("anomalyStateful batch mode fails fast on low-cardinality keys") {
    def ev(id: Int) = AnomalyEvent("only_key",
      Timestamp.valueOf(f"2026-01-01 10:0$id:00"), id.toLong, id.toDouble)
    val evs = (1 to 8).map(ev).toDS()
    val ex = intercept[IllegalArgumentException] {
      StreamingOps.anomalyStateful(evs, retainState = false,
        maxBatchHistoryPerKey = 3L)
    }
    ex.getMessage should include("window-aggregate")
    // under the bound the identical call runs
    StreamingOps.anomalyStateful(evs, retainState = false,
      maxBatchHistoryPerKey = 8L).collect().length shouldBe 8
  }
}
