package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** SCD Type-2 history builder. */
class Scd2Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("consecutive duplicates collapse; intervals chain; last is open") {
    val obs = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "bronze"),
      (1L, ts("2026-01-02 10:00:00"), 2L, "bronze"), // no change
      (1L, ts("2026-01-03 10:00:00"), 3L, "gold"),
      (1L, ts("2026-01-04 10:00:00"), 4L, "gold"),   // no change
      (1L, ts("2026-01-05 10:00:00"), 5L, "bronze")) // back again = new version
      .toDF("id", "ts", "seq", "tier")
    val out = Temporal.scd2(obs, "id", "ts", "seq", Seq("tier"))
      .collect().sortBy(_.getLong(4))
    out.length shouldBe 3
    out.map(_.getString(1)).toSeq shouldBe Seq("bronze", "gold", "bronze")
    out.map(_.getLong(4)).toSeq shouldBe Seq(1L, 2L, 3L)
    // intervals chain exactly: each valid_to equals the next valid_from
    out(0).getTimestamp(3) shouldBe out(1).getTimestamp(2)
    out(1).getTimestamp(3) shouldBe out(2).getTimestamp(2)
    out(2).isNullAt(3) shouldBe true
    out.map(_.getBoolean(5)).toSeq shouldBe Seq(false, false, true)
  }

  test("null attribute values are versions too; all-null opening row kept") {
    val obs = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, null),
      (1L, ts("2026-01-02 10:00:00"), 2L, null), // still null: no change
      (1L, ts("2026-01-03 10:00:00"), 3L, "set"),
      (1L, ts("2026-01-04 10:00:00"), 4L, null)) // unset again
      .toDF("id", "ts", "seq", "attr")
    val out = Temporal.scd2(obs, "id", "ts", "seq", Seq("attr"))
      .collect().sortBy(_.getLong(4))
    out.length shouldBe 3
    out.map(r => Option(r.getString(1))).toSeq shouldBe
      Seq(None, Some("set"), None)
  }

  test("same-timestamp observations order by the tiebreak column") {
    val t0 = ts("2026-01-01 10:00:00")
    val obs = Seq((1L, t0, 2L, "b"), (1L, t0, 1L, "a"))
      .toDF("id", "ts", "seq", "v")
    val out = Temporal.scd2(obs, "id", "ts", "seq", Seq("v"))
      .collect().sortBy(_.getLong(4))
    out.map(_.getString(1)).toSeq shouldBe Seq("a", "b")
  }

  test("multi-attribute change detection: any tracked column triggers") {
    val obs = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "x", 1),
      (1L, ts("2026-01-02 10:00:00"), 2L, "x", 2), // second attr changed
      (1L, ts("2026-01-03 10:00:00"), 3L, "x", 2)) // nothing changed
      .toDF("id", "ts", "seq", "a", "b")
    Temporal.scd2(obs, "id", "ts", "seq", Seq("a", "b"))
      .count() shouldBe 2L
  }
}
