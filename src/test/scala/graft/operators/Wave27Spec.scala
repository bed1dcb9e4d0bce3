package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-27: cross-correlation, run-length streaks, session
  * entry/exit matrix, top-k with (other). */
class Wave27Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("crossCorrelation: the shifted copy peaks at its lag") {
    // B(d) = A(d-2): corr at lag 2 is exactly 1.0 over all 5 pairs
    val a = Seq(1L, 5L, 2L, 8L, 3L)
    val rows = a.zipWithIndex.map { case (v, d) => ("A", d.toLong, v) } ++
      a.zipWithIndex.map { case (v, d) => ("B", d.toLong + 2, v) }
    val r = Stats.crossCorrelation(rows.toDF("s", "day", "x"), "s",
      "day", "x", "A", "B", maxLag = 7).collect()
    // only lags where the shifted series overlap at all: -2..6
    r.length shouldBe 9
    val best = r.find(_.getBoolean(3)).get
    best.getLong(0) shouldBe 2L // lag
    best.getLong(1) shouldBe 5L // all five days overlap
    best.getDouble(2) shouldBe 1.0
    // a one-day overlap cannot be scored
    r.find(_.getLong(0) == -2L).get.isNullAt(2) shouldBe true
  }

  test("crossCorrelation: constant series flag NO best lag") {
    val rows = (0L to 9L).map(d => ("A", d, 5L)) ++
      (0L to 9L).map(d => ("B", d, 5L))
    val r = Stats.crossCorrelation(rows.toDF("s", "day", "x"), "s",
      "day", "x", "A", "B", maxLag = 3).collect()
    r.foreach { x =>
      x.isNullAt(2) shouldBe true // zero variance: no corr
      x.getBoolean(3) shouldBe false // and therefore no argmax
    }
  }

  test("runLengths: islands break on gaps") {
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 3L, true),
      ("g", 4L, false), ("g", 5L, true), ("g", 7L, true),
      ("g", 8L, true)).toDF("g", "day", "flag")
    val r = Temporal.runLengths(df, "g", "day", "flag").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    r shouldBe Array((1L, 3L, 3L), (5L, 5L, 1L), (7L, 8L, 2L))
  }

  test("entryExitMatrix: gap sessions, composite ties, shares") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val evs = Seq(
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(10), "click"),
      (1L, 3L, ts(2000), "purchase"), // 1990s gap: new session
      (2L, 4L, ts(0), "error"),
      (3L, 5L, ts(0), "a"), (3L, 6L, ts(0), "b")) // same-ts tie
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Events.entryExitMatrix(evs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    r(("view", "click")) shouldBe ((1L, 1.0))
    r(("purchase", "purchase")) shouldBe ((1L, 1.0))
    r(("error", "error")) shouldBe ((1L, 1.0))
    r(("a", "b")) shouldBe ((1L, 1.0)) // id 5 enters, id 6 exits
    r.size shouldBe 4
  }

  test("topKWithOthers: rollup row, deterministic tie rank") {
    val cats = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("d")
    val r = Profile.topKWithOthers(cats.toDF("c"), "c", k = 2)
      .collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    r("a") shouldBe ((5L, 1L, 0.454545))
    r("b") shouldBe ((3L, 1L, 0.272727))
    r("(other)") shouldBe ((3L, 2L, 0.272727)) // c + d folded
    r.size shouldBe 3
  }
}
