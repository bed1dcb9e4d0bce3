package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Sampling

final case class Doc(doc_id: Long, source: String, text: String)

/** The stateless curation operators (hash sampling, PII redaction,
  * quality filters) are pure row-local projections/filters, so the SAME
  * calls run on a streaming ingest — this spec pins stream == batch for
  * the composed curation projection. */
class StreamingCurationSpec extends AnyFunSuite with Matchers
    with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "s0", "contact alice@example.com about the data"),
    Doc(2L, "s1", "plain text with several ordinary words"),
    Doc(3L, "s0", "ssn 123-45-6789 appears in this row"),
    Doc(4L, "s1", "more ordinary text rows for sampling"),
    Doc(5L, "s0", "yet another clean document body here"),
    Doc(6L, "s1", "final row of the tiny corpus"))

  private def curationStage(df: org.apache.spark.sql.DataFrame) =
    Sampling.hashSample(df, "doc_id", 0.7)
      .select(col("doc_id"), col("source"),
        TextFunctions.redactPii(col("text")).as("clean_text"),
        round(TextFunctions.qualityScore(col("text")), 6).as("quality"))

  test("hash sample + PII redaction: streaming output == batch output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = curationStage(mem.toDF())
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("cur_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3))).toSet
      val batch = curationStage(docs.toDF()).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3))).toSet
      streamed shouldBe batch
      batch should not be empty
      // the redaction really ran on the stream
      streamed.foreach { case (_, _, t, _) =>
        t should not include "@"
        t should not include "123-45"
      }
    } finally q.stop()
  }
}
