package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-22: OHLC resampling tie-breaks and half-life trending
  * closed forms. */
class Wave22Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("resampleOhlc: open/close by (epoch, id), same-second ties exact") {
    // one bucket: (10s,id1,5), (10s,id2,7), (30s,id4,9), (50s,id3,2)
    // open = 5 (id tie-break), close = 2, high 9, low 2, volume 23
    val df = Seq((10L, 1L, 5.0), (10L, 2L, 7.0), (30L, 4L, 9.0),
      (50L, 3L, 2.0))
      .map { case (s, id, v) => ("k", new Timestamp(s * 1000L), id, v) }
      .toDF("g", "ts", "event_id", "value")
    val r = Temporal.resampleOhlc(df, "g", "ts", "value", "event_id",
      bucketSeconds = 3600L).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n") shouldBe 4L
    r.head.getAs[Double]("open") shouldBe 5.0
    r.head.getAs[Double]("high") shouldBe 9.0
    r.head.getAs[Double]("low") shouldBe 2.0
    r.head.getAs[Double]("close") shouldBe 2.0
    r.head.getAs[Double]("volume") shouldBe 23.0
  }

  test("trendingScore: 2^-age weights vs the corpus's last day") {
    // as-of = day 2; A: 1 event day2 + 2 events day1 -> 1 + 2*.5 = 2;
    // B: 4 events day0 -> 4*.25 = 1
    val day = 86400000L
    val evs = (Seq((2L, "A"), (1L, "A"), (1L, "A")) ++
      Seq.fill(4)((0L, "B")))
      .zipWithIndex.map { case ((d, u), i) =>
        (u, new Timestamp(d * day + i), i.toLong) }
      .toDF("user", "ts", "event_id")
    val r = Events.trendingScore(evs, "user")
      .collect().map(x => x.getAs[String]("user") ->
        (x.getAs[Long]("n_events"), x.getAs[Double]("score")))
    r.head shouldBe ("A", (3L, 2.0))
    r(1) shouldBe ("B", (4L, 1.0))
  }
}
