package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-28: growth accounting and mutual nearest neighbors
  * (retention rate and step latency are wiring-level compositions of
  * already-spec'd operators, pinned by their oracles). */
class Wave28Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("growthAccounting: new/retained/resurrected/churned ledger") {
    def ts(week: Long) = new Timestamp(week * 604800L * 1000L)
    // u1: w0, w1, w3 (gap at 2); u2: w1 only; u3: w0..w3
    val evs = (Seq(0L, 1L, 3L).map(w => (1L, ts(w))) ++
      Seq((2L, ts(1L))) ++ (0L to 3L).map(w => (3L, ts(w))))
      .toDF("user_id", "ts")
    val r = Events.growthAccounting(evs, anchorEpoch = 0L).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    r(0L) shouldBe ((2L, 0L, 0L, 0L))
    r(1L) shouldBe ((1L, 2L, 0L, 0L))
    r(2L) shouldBe ((0L, 1L, 0L, 2L)) // u1 gap + u2 vanish
    r(3L) shouldBe ((0L, 1L, 1L, 0L)) // u1 resurrects
    r.size shouldBe 4 // week 4 churn is past the horizon: censored
  }

  test("mutualNearestNeighbors: identical twins pair up, once each") {
    def vec(hot: Int) =
      Array.tabulate(64)(i => if (i == hot) 1.0f else 0.0f)
    val df = Seq((1L, vec(0)), (2L, vec(0)), (3L, vec(7)),
      (4L, vec(7))).toDF("vec_id", "embedding")
    val r = Similarity.mutualNearestNeighbors(df, nPlanes = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    r.toSet shouldBe Set((1L, 2L, 1.0), (3L, 4L, 1.0))
  }
}
