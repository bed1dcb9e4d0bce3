package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-7 wave-2 operators: containment pairs, incremental connected
  * components, degree power-law, RFM segmentation. */
class Wave2Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("containmentPairs: an excerpt is contained in its source, not vice versa") {
    val source = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val excerpt = "beta gamma delta epsilon zeta" // shingles all in source
    val other = "one two three four five six"
    val df = Seq((1L, source), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        n = 3, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // excerpt: 3 shingles, all present among source's 8 -> containment 1
    out((2L, 1L)) shouldBe 1.0
    // source in excerpt: 3/8 = 0.375 < 0.6 -> absent
    out.contains((1L, 2L)) shouldBe false
    out.keySet.flatMap(p => Set(p._1, p._2)) should not contain 3L
    Dedup.releaseCaches()
  }

  test("containmentPairs plan: candidate generation is an equi-join, no cartesian") {
    val df = Seq((1L, "a b c d e"), (2L, "b c d")).toDF("doc_id", "text")
    val plan = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
      threshold = 0.5).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    Dedup.releaseCaches()
  }

  test("incrementalComponents: delta merge equals from-scratch CC") {
    // base: {1,2,3} and {10,11}; isolated-so-far 20
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val baseLabels = Graph.connectedComponents(base)
    // delta: bridges the two components via 3-10, adds new node 30-11,
    // and a fully-new component 40-41
    val delta = Seq((3L, 10L), (30L, 11L), (40L, 41L))
      .toDF("id_a", "id_b")
    val got = Graph.incrementalComponents(baseLabels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Graph.connectedComponents(
        base.unionByName(delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe scratch
    got(11L) shouldBe 1L // merged mega-component labeled by min id
    got(30L) shouldBe 1L
    got(40L) shouldBe 40L
  }

  test("incrementalComponents: empty delta preserves the base labeling") {
    val base = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val labels = Graph.connectedComponents(base)
    val out = Graph.incrementalComponents(labels,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L)
  }

  test("degreePowerLaw: hand-computed star graph") {
    // star: center 1 with 4 leaves -> degs 4,1,1,1,1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("id_a", "id_b")
    val r = Graph.degreePowerLaw(star).collect().head
    r.getAs[Long]("n_nodes") shouldBe 5L
    r.getAs[Long]("n_edges") shouldBe 4L
    r.getAs[Long]("max_deg") shouldBe 4L
    r.getAs[Double]("mean_deg") shouldBe 1.6
    // alpha = 1 + 5 / ln(4)
    r.getAs[Double]("alpha") shouldBe BigDecimal(1.0 + 5.0 / math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("degreePowerLaw: all-degree-one graph yields null alpha") {
    val m = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Graph.degreePowerLaw(m).collect().head
    r.isNullAt(r.fieldIndex("alpha")) shouldBe true
  }

  test("rfmSegments: hand-computed metrics, bins, and exact money") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: recent, frequent, big spender
      (1L, 1L, ts("2026-01-10 00:00:00"), "view", 0.0),
      (2L, 1L, ts("2026-01-10 01:00:00"), "purchase", 10.05),
      (3L, 1L, ts("2026-01-10 02:00:00"), "purchase", 20.10),
      // user 2: mid
      (4L, 2L, ts("2026-01-05 00:00:00"), "purchase", 5.00),
      (5L, 2L, ts("2026-01-05 01:00:00"), "view", 0.0),
      // user 3: stale, one event, no purchases
      (6L, 3L, ts("2026-01-01 00:00:00"), "view", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.rfmSegments(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    out(1L).getAs[Long]("recency_days") shouldBe 0L
    out(1L).getAs[Long]("frequency") shouldBe 3L
    out(1L).getAs[Double]("monetary") shouldBe 30.15 // decimal-exact
    out(3L).getAs[Long]("recency_days") shouldBe 9L
    out(3L).getAs[Double]("monetary") shouldBe 0.0
    // terciles over {0,5,9} recency, {1,2,3} freq, {0,5,30.15} money:
    // with n=3 the q2 discrete threshold IS the max (cume_dist of the
    // 2nd value, 2/3 = 0.666..., is below the 0.66666667 literal), so
    // nothing strictly exceeds it — the max lands in bin 2, ties-low
    // by the documented convention (both engines agree, probed)
    out(1L).getAs[String]("segment") shouldBe "R1F2M2"
    out(2L).getAs[String]("segment") shouldBe "R2F2M2"
    out(3L).getAs[String]("segment") shouldBe "R2F1M1"
  }

  test("rfmSegments: ties share a bin (never split by row order)") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = (1L to 6L).map(u =>
      (u, u, ts("2026-01-10 00:00:00"), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.rfmSegments(ev).collect()
    out.map(_.getAs[Int]("r_bin")).toSet shouldBe Set(1)
    out.map(_.getAs[Int]("f_bin")).toSet shouldBe Set(1)
  }
}
