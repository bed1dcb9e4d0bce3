package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard end-to-end training-data preparation, as ONE composable
  * call: quality curation → benchmark decontamination → transitive
  * near-dup dedup → per-stratum mix sampling → context-window chunking.
  * Output is the training-sequence table (id, chunk_no, n_tokens,
  * chunk_text).
  *
  * Every stage is one of the engine's individually-oracle-checked
  * operators; the composition itself is oracle-checked end-to-end as
  * `q_pipeline` (a single composed SQL chain). Stage order follows
  * curation practice: cheap row-local filters first (quality), then the
  * benchmark semi-join, then the quadratic-candidate near-dup stage on
  * the already-shrunk pool, then sampling, and chunking last so dropped
  * docs never tokenize into windows.
  */
object Pipeline {

  def prepareTrainingData(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, stratumCol: String,
      minQuality: Double = 0.5, maxRepetition: Double = 0.9,
      nContamination: Int = 13, nJaccard: Int = 3,
      jaccardThreshold: Double = 0.8,
      rates: Map[String, Double] = Map.empty, defaultRate: Double = 1.0,
      chunkSize: Int = 512, overlap: Int = 64): DataFrame = {
    val curatedIds = TextQuality
      .curate(corpus, idCol, textCol, minQuality, maxRepetition)
      .select(col("doc_id").as(idCol))
    val base = corpus.join(curatedIds, Seq(idCol), "left_semi")
    // cleaned feeds THREE consumers (pair generation, the dedup
    // anti-join, and the sample->chunk tail): the cache boundary runs
    // the curate scoring + exact-dedup + decontamination anti-join once
    val cleaned = TrackedCaches.persist(
      Decontaminate.decontaminate(base, benchmark,
        idCol, textCol, nContamination))
    val pairs = Dedup.ngramJaccardPairs(cleaned, idCol, textCol,
      nJaccard, jaccardThreshold)
    val deduped = Graph.dedupByComponents(cleaned, pairs, idCol)
    val sampled = Sampling.stratifiedSample(deduped, idCol, stratumCol,
      rates, defaultRate)
    Chunking.chunkTokens(sampled, idCol, textCol, chunkSize, overlap)
  }
}
