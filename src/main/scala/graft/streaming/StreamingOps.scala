package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference has no streaming at all
  * (SURVEY.md §2.10); this is the engine extension for event streams:
  * the same event-time logic as `graft.operators.Events`, plus
  * watermarking so state is bounded under late data.
  *
  * Usage:
  * {{{
  *   val stream = spark.readStream.schema(eventSchema).parquet(dir)
  *   StreamingOps.windowedCounts(stream)
  *     .writeStream.outputMode("update").format("console").start()
  * }}}
  */
object StreamingOps {

  /** Tumbling-window per-type counts with a late-data watermark.
    * Works on both streaming and batch DataFrames (watermark is a no-op
    * in batch), so batch backfill and the live stream share one code
    * path. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Events.exactValueSum)

  /** Streaming dedup on a key column bounded by the watermark window —
    * the streaming analogue of `Dedup.dedupExact`. */
  def dedupStream(events: DataFrame, keyCol: String,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)
}
