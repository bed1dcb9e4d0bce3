package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordShingles

/** Benchmark decontamination: drop (or flag) training documents whose
  * text overlaps an evaluation set — the standard pre-training hygiene
  * step (n-gram collision against eval benchmarks, as popularized by
  * GPT-3/PaLM data cards, typically with 8-13-gram windows).
  *
  * Shape at 100 TB: the corpus is shingled once (persisted behind a
  * [[TrackedCaches]] boundary like every tokenize-then-explode
  * operator), shingles ride as 64-bit hashes, and the benchmark shingle
  * set — eval sets are bounded by contract (MBs, not TBs) — is
  * BROADCAST, so the overlap count is a map-side hash join + one
  * hash-aggregate keyed by doc. No corpus shuffle at all.
  */
object Decontaminate {

  private def shingleHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // wordShingles is already distinct; hashing keeps distinctness
    // (64-bit collisions are the accepted shingle-hash contract)
    TrackedCaches.persist(
      df.select(col(idCol).as("did"), col(textCol).as("txt"))
        .repartition(par, col("did"))
        .select(col("did"),
          transform(wordShingles(col("txt"), n), x => xxhash64(x))
            .as("sh")))
      .select(col("did"), explode(col("sh")).as("h"))
  }

  /** Per-document count of distinct corpus n-grams that also occur
    * anywhere in `benchmark`: (idCol, n_overlap), only docs with at
    * least one hit. */
  def overlapCounts(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val bench = benchmark
      .select(explode(transform(
        wordShingles(col(textCol), n), x => xxhash64(x))).as("h"))
      .distinct()
    shingleHashes(corpus, idCol, textCol, n)
      .join(broadcast(bench), "h")
      .groupBy(col("did").as(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Per-document overlap FRACTION against the benchmark set — the
    * GPT-3-style graded contamination signal (drop when > tau) rather
    * than [[decontaminate]]'s any-hit rule: (idCol, n_shingles,
    * n_overlap, frac) for every corpus doc with at least one shingle,
    * frac = n_overlap / n_shingles rounded to 6dp. Same single
    * shingle pass as [[overlapCounts]], but the benchmark probe is a
    * broadcast LEFT join folded into the per-doc count agg — docs with
    * zero hits keep a row (the threshold decision needs them). */
  def overlapFraction(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val bench = benchmark
      .select(explode(transform(
        wordShingles(col(textCol), n), x => xxhash64(x))).as("h"))
      .distinct()
      .withColumn("__hit", lit(1L))
    shingleHashes(corpus, idCol, textCol, n)
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy(col("did").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum("__hit"), lit(0L)).as("n_overlap"))
      .withColumn("frac",
        round(col("n_overlap") / col("n_shingles"), 6))
  }

  /** Corpus rows whose benchmark n-gram overlap is <= `maxOverlap`
    * (default: any hit contaminates). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13, maxOverlap: Long = 0L)
      : DataFrame = {
    val dirty = overlapCounts(corpus, benchmark, idCol, textCol, n)
      .filter(col("n_overlap") > maxOverlap)
      .select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }
}
