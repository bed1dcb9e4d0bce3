package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Regression guard for TIMESTAMP_NTZ event sources.
  *
  * pandas/pyarrow and DuckDB write parquet timestamps WITHOUT the UTC
  * adjustment flag by default, which Spark 4 reads back as
  * `TIMESTAMP_NTZ` — and `cast("long")` is not a legal cast from NTZ
  * (round-5 incident: five event/streaming queries crashed with
  * DATATYPE_MISMATCH when the driver regenerated testdata in that
  * flavor). Every event query must therefore go through
  * `unix_timestamp`/the normalizing loader. This spec writes a genuine
  * NTZ parquet events table and drives the exact `SparkEntry.queries`
  * entry points over it, pinning the epoch arithmetic to known values.
  */
class NtzEpochSpec extends AnyFunSuite with SparkSpec {

  // 2024-01-01 00:00:00 UTC
  private val H0 = 1704067200L

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ntz").toString
    // to_timestamp_ntz keeps the wall clock zone-less end to end; the
    // parquet written from it carries isAdjustedToUTC=false — the exact
    // flavor the driver's regenerated testdata has
    val ev = spark.range(0, 240).select(
      col("id").as("event_id"),
      to_timestamp_ntz(
        // 4 users x 60 events, one event per minute starting at H0, so
        // user u's events span [H0, H0+59m] — one 30-min-gap session
        from_unixtime(lit(H0) + (col("id") % 60) * 60L)).as("ts"),
      (col("id") / 60).cast("long").as("user_id"),
      when(col("id") % 3 === 0, "click").otherwise("view").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    ev.coalesce(1).write.parquet(s"$d/events.parquet")
    spark.range(0, 4).select(
        col("id").as("c_custkey"),
        when(col("id") % 2 === 0, "BUILDING").otherwise("MACHINERY")
          .as("c_mktsegment"))
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    d
  }

  test("testdata flavor really is TIMESTAMP_NTZ") {
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
  }

  test("q_event_hourly on NTZ parquet: correct hour epochs") {
    val rows = SparkEntry.queries("q_event_hourly")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    // all 240 events are inside [H0, H0+1h)
    assert(rows.forall(_.getAs[Long]("hour_epoch") == H0))
    assert(rows.map(_.getAs[Long]("cnt")).sum == 240L)
  }

  test("q_sessionize on NTZ parquet: one session per user, exact bounds") {
    val rows = SparkEntry.queries("q_sessionize")(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getAs[Long]("start_epoch") == H0 &&
      r.getAs[Long]("end_epoch") == H0 + 59 * 60 &&
      r.getAs[Long]("n_events") == 60L))
  }

  test("q_stream_hourly / q_stream_sliding / q_stream_enrich on NTZ parquet") {
    val hourly = SparkEntry.queries("q_stream_hourly")(spark, dir).collect()
    assert(hourly.map(_.getAs[Long]("cnt")).sum == 240L)
    assert(hourly.forall(_.getAs[Long]("hour_epoch") == H0))

    // 1h windows hopping every 30 min: minutes 0-29 land in the windows
    // starting at H0-30m and H0; minutes 30-59 in those at H0 and H0+30m
    val sliding = SparkEntry.queries("q_stream_sliding")(spark, dir).collect()
    assert(sliding.map(_.getAs[Long]("win_epoch")).distinct.sorted.toSeq ==
      Seq(H0 - 1800, H0, H0 + 1800))
    assert(sliding.map(_.getAs[Long]("cnt")).sum == 480L)

    val enrich = SparkEntry.queries("q_stream_enrich")(spark, dir).collect()
    assert(enrich.map(_.getAs[Long]("cnt")).sum == 240L)
    assert(enrich.map(_.getAs[String]("c_mktsegment")).toSet ==
      Set("BUILDING", "MACHINERY"))
  }

  test("stateful sessionizer matches the window formulation on NTZ input") {
    val a = SparkEntry.queries("q_stream_sessionize_state")(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q_sessionize")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("Events operators accept a raw NTZ frame directly (no loader)") {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    // sessionize's gap test must not cast("long") the NTZ column
    assert(Events.sessionize(raw).count() == 4L)
    assert(Events.rollingWindow(raw).count() == 240L)
    assert(Events.hourlyByType(raw).select(sum("cnt")).first().getLong(0)
      == 240L)
  }
}
