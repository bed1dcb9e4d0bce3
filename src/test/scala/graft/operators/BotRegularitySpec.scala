package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: bot-regularity heuristic (restored after an
  * accidental clobber by the round-11 wave spec). */
class BotRegularitySpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("botRegularity: metronomic gaps flag, bursty gaps don't, " +
    "zero-gap pairs need the event floor") {
    val df = Seq(
      // A: gaps 10,10,10 -> cv 0 -> bot (minEvents 3)
      (1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (1L, ts(30)),
      // B: gaps 5,25,1 -> cv 1.244342 -> not bot
      (2L, ts(0)), (2L, ts(5)), (2L, ts(30)), (2L, ts(31)),
      // C: one zero gap -> metronomic but under the event floor
      (3L, ts(7)), (3L, ts(7)))
      .toDF("user_id", "ts")
    val out = Events.botRegularity(df, "user_id", "ts",
        minEvents = 3, maxCv = 0.1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4)))).toMap
    out(1L) shouldBe ((4L, 10.0, Some(0.0), true))
    out(2L) shouldBe ((4L, 10.3333, Some(1.244342), false))
    out(3L) shouldBe ((2L, 0.0, None, false))
  }
}
