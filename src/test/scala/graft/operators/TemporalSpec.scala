package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TemporalSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: (id, key, ts-seconds); right: (key, ts-seconds, rid, rv)
  private def asof(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)]): Map[Long, (Option[Long], Option[Double])] = {
    val l = left.map { case (id, k, t) => (id, k, ts(t)) }
      .toDF("id", "key", "t")
    val r = right.map { case (k, t, rid, rv) => (k, ts(t), rid, rv) }
      .toDF("key", "t", "rid", "rv")
    Temporal.asofJoin(l, r, "key", "key", "t", "t", Seq("rid", "rv"))
      .collect()
      .map(row => row.getLong(0) ->
        (Option(row.get(3)).map(_.asInstanceOf[Long]),
         Option(row.get(4)).map(_.asInstanceOf[Double])))
      .toMap
  }

  test("asof picks the most recent right row at-or-before, per key") {
    val out = asof(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 50L)),
      right = Seq((7L, 100L, 10L, 1.0), (7L, 200L, 20L, 2.0)))
    out(1L) shouldBe (Some(10L), Some(1.0)) // inclusive <= match
    out(2L) shouldBe (Some(20L), Some(2.0))
    out(3L) shouldBe (None, None) // before the first right row
  }

  test("asof never matches across keys") {
    val out = asof(
      left = Seq((1L, 1L, 100L)),
      right = Seq((2L, 50L, 10L, 1.0)))
    out(1L) shouldBe (None, None)
  }

  test("asof: NULL keys never match (SQL equi-join semantics)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("key", LongType), StructField("t", TimestampType)))
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null, ts(100L)), Row(2L, 7L, ts(100L)))), schema)
    val rSchema = StructType(Seq(StructField("key", LongType),
      StructField("t", TimestampType), StructField("rid", LongType),
      StructField("rv", DoubleType)))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, ts(50L), 10L, 1.0), Row(7L, ts(50L), 20L, 2.0))), rSchema)
    val out = Temporal.asofJoin(l, r, "key", "key", "t", "t",
        Seq("rid", "rv"))
      .collect().map(row => row.getLong(0) -> Option(row.get(3))).toMap
    out(1L) shouldBe None // NULL left key matches nothing
    out(2L) shouldBe Some(20L) // and never sees the NULL-key right row
  }

  test("asof ties on an exact right instant break to the max head payload") {
    val out = asof(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 100L, 10L, 1.0), (7L, 100L, 30L, 3.0),
        (7L, 100L, 20L, 2.0)))
    out(1L) shouldBe (Some(30L), Some(3.0))
  }

  test("asof equals the brute-force argmax on a random frame") {
    val rng = new scala.util.Random(42)
    val left = (1L to 200L).map(i =>
      (i, rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
    val right = (1L to 80L).map(i =>
      (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i, i * 0.5))
    val expected = left.map { case (id, k, t) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      val best = if (cands.isEmpty) (None, None)
      else {
        val m = cands.maxBy(c => (c._2, c._3))
        (Some(m._3), Some(m._4))
      }
      id -> best
    }.toMap
    asof(left, right) shouldBe expected
  }

  private def range(points: Seq[(Long, Long, Long)],
      intervals: Seq[(Long, Long, Long, Long)],
      bucketSeconds: Long): Set[(Long, Long)] = {
    val p = points.map { case (id, k, t) => (id, k, ts(t)) }
      .toDF("id", "key", "t")
    val iv = intervals.map { case (wid, k, s, e) => (wid, k, ts(s), ts(e)) }
      .toDF("wid", "key", "lo", "hi")
    Temporal.rangeJoin(p, iv, "key", "key", "t", "lo", "hi",
        Seq("wid"), bucketSeconds)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
  }

  test("range join: half-open [lo, hi) membership, same key only") {
    val pairs = range(
      points = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 99L),
        (4L, 8L, 150L)),
      intervals = Seq((50L, 7L, 100L, 200L)),
      bucketSeconds = 60L)
    pairs shouldBe Set((1L, 50L)) // 200 excluded (hi), 99 below, 4 wrong key
  }

  test("range join: a point in overlapping intervals matches each once") {
    val pairs = range(
      points = Seq((1L, 7L, 150L)),
      intervals = Seq((50L, 7L, 100L, 200L), (51L, 7L, 140L, 160L),
        (52L, 7L, 150L, 151L)),
      bucketSeconds = 30L)
    pairs shouldBe Set((1L, 50L), (1L, 51L), (1L, 52L))
  }

  test("range join output is bucket-width invariant (no dup, no loss)") {
    val rng = new scala.util.Random(7)
    val points = (1L to 300L).map(i =>
      (i, rng.nextInt(4).toLong, rng.nextInt(5000).toLong))
    val intervals = (1L to 60L).map { i =>
      val lo = rng.nextInt(5000).toLong
      (i, rng.nextInt(4).toLong, lo, lo + 1 + rng.nextInt(600).toLong)
    }
    val expected = (for {
      (id, k, t) <- points
      (wid, ik, lo, hi) <- intervals
      if ik == k && t >= lo && t < hi
    } yield (id, wid)).toSet
    for (w <- Seq(1L, 97L, 600L, 10000L))
      range(points, intervals, w) shouldBe expected
  }

  // left: (lid, key, start-s, end-s); right: (rid, key, start-s, end-s)
  private def overlap(left: Seq[(Long, Long, Long, Long)],
      right: Seq[(Long, Long, Long, Long)], bucket: Long)
      : Set[(Long, Long)] = {
    val l = left.map { case (i, k, s, e) => (i, k, ts(s), ts(e)) }
      .toDF("lid", "key", "ls", "le")
    val r = right.map { case (i, k, s, e) => (i, k, ts(s), ts(e)) }
      .toDF("rid", "rkey", "rs", "re")
    Temporal.intervalJoin(l, r, "key", "rkey", "ls", "le", "rs", "re",
        Seq("lid"), Seq("rid"), bucket)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  test("interval join: overlapping pairs exactly once, disjoint never") {
    val got = overlap(
      left = Seq((1L, 7L, 100L, 200L), (2L, 7L, 300L, 400L)),
      right = Seq(
        (10L, 7L, 150L, 160L),  // inside left 1
        (11L, 7L, 190L, 310L),  // spans left 1 AND left 2
        (12L, 7L, 200L, 250L),  // touches left 1's end: half-open, no
        (13L, 8L, 100L, 200L)), // other key
      bucket = 30L)
    got shouldBe Set((1L, 10L), (1L, 11L), (2L, 11L))
  }

  test("interval join: long shared spans emit ONE row despite many " +
      "shared buckets (first-bucket dedup)") {
    // both intervals cover ~20 buckets at bucket=10
    val got = overlap(
      left = Seq((1L, 7L, 0L, 200L)),
      right = Seq((10L, 7L, 50L, 180L)),
      bucket = 10L)
    got shouldBe Set((1L, 10L))
  }

  test("interval join output is bucket-width invariant") {
    val l = (0L until 40L).map(i => (i, i % 3, i * 7L, i * 7L + 25L))
    val r = (0L until 40L).map(i => (100L + i, i % 3, i * 5L, i * 5L + 40L))
    val a = overlap(l, r, bucket = 7L)
    val b = overlap(l, r, bucket = 97L)
    val c = overlap(l, r, bucket = 1L)
    a shouldBe b
    a shouldBe c
    // brute force oracle
    val expect = (for {
      (li, lk, ls, le) <- l
      (ri, rk, rs, re) <- r
      if lk == rk && ls < re && rs < le
    } yield (li, ri)).toSet
    a shouldBe expect
  }

  test("interval join: zero-length [s, s) intervals never match") {
    // empty interval on either side: ls < re && rs < le can't hold
    val got = overlap(
      left = Seq((1L, 7L, 100L, 100L), (2L, 7L, 100L, 200L)),
      right = Seq((10L, 7L, 100L, 100L), (11L, 7L, 50L, 150L)),
      bucket = 30L)
    got shouldBe Set((2L, 11L))
  }

  test("interval plan: equi-join, no nested loop or cartesian") {
    val l = Seq((1L, 1L, ts(0L), ts(100L))).toDF("lid", "key", "ls", "le")
    val r = Seq((2L, 1L, ts(50L), ts(60L))).toDF("rid", "rkey", "rs", "re")
    val plan = Temporal.intervalJoin(l, r, "key", "rkey", "ls", "le",
        "rs", "re", Seq("lid"), Seq("rid"), 30L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "Cartesian"
  }

  test("asof plan: one shuffle on the key, no join operator") {
    val l = Seq((1L, 1L, ts(10L))).toDF("id", "key", "t")
    val r = Seq((1L, ts(5L), 2L, 1.0)).toDF("key", "t", "rid", "rv")
    val plan = Temporal.asofJoin(l, r, "key", "key", "t", "t",
      Seq("rid", "rv")).queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Cartesian"
  }

  test("range plan: equi-join, no nested loop or cartesian") {
    val p = Seq((1L, 1L, ts(10L))).toDF("id", "key", "t")
    val iv = Seq((9L, 1L, ts(5L), ts(50L))).toDF("wid", "key", "lo", "hi")
    val plan = Temporal.rangeJoin(p, iv, "key", "key", "t", "lo", "hi",
      Seq("wid"), 60L).queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "Cartesian"
  }
}
