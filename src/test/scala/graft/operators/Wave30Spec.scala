package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-30: modularity and bounce rate (hourly heatmap and
  * daily medians are wiring compositions pinned by their oracles). */
class Wave30Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("modularity: two triangles + bridge = 6/7 - 1/2") {
    val nodes = Seq((1L, "X"), (2L, "X"), (3L, "X"), (4L, "Y"),
      (5L, "Y"), (6L, "Y"), (7L, null.asInstanceOf[String]))
      .toDF("id", "comm")
    // dups, a reversed copy, and a self-loop must all collapse; the
    // (6,7) edge touches an unlabeled node and is excluded
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L), (5L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val r = Graph.modularity(nodes, edges, "id", "comm").collect().head
    r.getLong(0) shouldBe 7L // n_edges (labeled)
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 6L // within
    r.getLong(3) shouldBe 1L // unlabeled
    r.getDouble(4) shouldBe 0.357143 // 6/7 - (49+49)/(4*49)
  }

  test("bounceRate: one-event sessions per entry type") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val evs = Seq(
      (1L, 1L, ts(0), "view"), // lone view: bounce
      (1L, 2L, ts(5000), "purchase"), (1L, 3L, ts(5010), "click"),
      (2L, 4L, ts(0), "view"), (2L, 5L, ts(10), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Events.bounceRate(evs).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    r("view") shouldBe ((2L, 1L, 0.5))
    r("purchase") shouldBe ((1L, 0L, 0.0))
    r.size shouldBe 2
  }
}
