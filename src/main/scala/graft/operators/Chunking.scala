package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * windows with overlap — the fan-out step that turns a curated corpus
  * into training sequences.
  *
  * Chunk `i` covers tokens `[i*stride, i*stride + size)` with
  * `stride = size - overlap`, so consecutive chunks share `overlap`
  * tokens; the final chunk may be shorter, and a document never emits a
  * chunk fully contained in the previous one
  * (`nChunks = max(1, ceil((n - overlap) / stride))`).
  *
  * Shape at 100 TB: tokenize once (persisted via [[TrackedCaches]] — the
  * cache boundary keeps `InferFiltersFromGenerate` + pushdown from
  * re-running the tokenizer inside the parquet scan), then a map-only
  * explode. No shuffle at all: chunks inherit the document's partition.
  */
object Chunking {

  /** One row per (doc, chunk): (idCol, chunk_no, n_tokens, chunk_text).
    * Tokens are whitespace-split (the engine's token convention, see
    * TextFunctions); empty documents emit nothing. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int = 512, overlap: Int = 64): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size: size=$size overlap=$overlap")
    val stride = size - overlap
    val par = df.sparkSession.sparkContext.defaultParallelism
    // repartition BEFORE tokenizing (small parquet arrives as one
    // partition), persist the token arrays (pushdown boundary)
    val toks = TrackedCaches.persist(
      df.filter(length(trim(col(textCol))) > 0)
        .select(col(idCol), col(textCol).as("txt"))
        .repartition(par, col(idCol))
        .select(col(idCol), split(trim(col("txt")), "\\s+").as("t")))
    toks
      .withColumn("n",
        org.apache.spark.sql.functions.size(col("t"))) // param shadows it
      .withColumn("nc", greatest(lit(1),
        ceil((col("n") - lit(overlap)).cast("double") / stride).cast("int")))
      .select(col(idCol), col("t"), col("n"),
        explode(sequence(lit(0), col("nc") - 1)).as("chunk_no"))
      .select(col(idCol), col("chunk_no"),
        least(lit(size), col("n") - col("chunk_no") * stride)
          .as("n_tokens"),
        array_join(
          slice(col("t"), col("chunk_no") * stride + 1, lit(size)), " ")
          .as("chunk_text"))
  }
}
