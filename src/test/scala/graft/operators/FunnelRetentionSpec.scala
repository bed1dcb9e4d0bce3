package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class FunnelRetentionSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, ty) => (u, ts(t), ty) }
      .toDF("user_id", "ts", "event_type")

  test("funnel: strictly-ordered chain reaches level 3") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:10", "click"),
      (1L, "2024-01-01 10:00:20", "purchase"))
    val r = Events.funnel(df).collect().head
    r.getAs[Int]("level") shouldBe 3
    r.getAs[Long]("t1") should be < r.getAs[Long]("t2")
    r.getAs[Long]("t2") should be < r.getAs[Long]("t3")
  }

  test("funnel: out-of-order steps do NOT chain") {
    // purchase before the first qualifying click -> level 2, not 3
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:05", "purchase"),
      (1L, "2024-01-01 10:00:10", "click"))
    Events.funnel(df).collect().head.getAs[Int]("level") shouldBe 2
  }

  test("funnel: same-second steps do not chain (strict seconds)") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"))
    Events.funnel(df).collect().head.getAs[Int]("level") shouldBe 1
  }

  test("funnel: user with no step-1 event is level 0 with null times") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-01 10:00:10", "purchase"))
    val r = Events.funnel(df).collect().head
    r.getAs[Int]("level") shouldBe 0
    r.isNullAt(r.fieldIndex("t1")) shouldBe true
  }

  test("funnel: earliest QUALIFYING step-2 is chosen, not earliest overall") {
    // click@09:59 precedes the view, click@10:01 qualifies; purchase
    // must come after the QUALIFYING click to count
    val df = ev(
      (1L, "2024-01-01 09:59:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "click"),
      (1L, "2024-01-01 10:00:30", "purchase"))
    val r = Events.funnel(df).collect().head
    r.getAs[Int]("level") shouldBe 2
    r.getAs[Long]("t2") shouldBe
      ts("2024-01-01 10:01:00").toInstant.getEpochSecond
  }

  test("funnel: users are independent") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:00:10", "click"))
    val m = Events.funnel(df).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level")).toMap
    m shouldBe Map(1L -> 1, 2L -> 0)
  }

  test("weeklyRetention: cohort and offsets from first active week") {
    // mid-week timestamps: correct whatever zone the JVM renders the
    // java.sql.Timestamp literals in (the operator itself is pure
    // instant math)
    val df = ev(
      (1L, "2024-01-04 12:00:00", "view"), // week 0
      (1L, "2024-01-11 12:00:00", "view"), // week 1
      (1L, "2024-01-25 12:00:00", "view"), // week 3
      (2L, "2024-01-11 12:00:00", "view"), // week 1 (cohort 1)
      (2L, "2024-01-18 12:00:00", "view")) // week 2
    val out = Events.weeklyRetention(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L)
  }

  test("weeklyRetention: multiple events in one week count once") {
    val df = ev(
      (1L, "2024-01-02 00:00:00", "view"),
      (1L, "2024-01-03 00:00:00", "click"),
      (2L, "2024-01-04 00:00:00", "view"))
    val out = Events.weeklyRetention(df).collect()
    out should have length 1
    out.head.getLong(2) shouldBe 2L // both users, week (0,0), once each
  }
}
