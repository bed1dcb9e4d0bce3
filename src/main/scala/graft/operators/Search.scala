package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus search scoring — Okapi BM25 over whitespace terms, the
  * retrieval-relevance complement to `TextQuality.tfidfTopTerms`
  * (curation pipelines use it to pull topical slices and to build
  * retrieval features for quality classifiers).
  *
  * Shape at 100 TB: tokens are filtered to the (tiny, literal) query
  * term set BEFORE any aggregation, so the per-doc term-frequency agg
  * only carries matching rows; corpus stats (N, avgdl) are one K=1
  * aggregate broadcast back; per-term document frequencies are a
  * query-sized table. One shuffle keyed by doc for the tf agg, one for
  * the score sum — nothing O(vocabulary) moves.
  */
object Search {

  /** Top-k BM25 docs for a whitespace-tokenized query string:
    * (idCol, bm25), Lucene-style idf = ln((N - df + .5)/(df + .5) + 1)
    * so scores stay positive; score rounded to 6dp, ties break by id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, topK: Int = 10, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    val terms = query.toLowerCase.trim.split("\\s+").distinct.toSeq
    require(terms.nonEmpty && terms.head.nonEmpty, "empty query")

    // cache boundary: toked feeds both the doc-length branch and the
    // tf explode — without it the corpus tokenizes twice AND the
    // explode-inferred size(t)>0 filter pushes the tokenizer into the
    // parquet scan (the documented InferFiltersFromGenerate trap)
    val toked = TrackedCaches.persist(
      docs.select(col(idCol).as("did"), tokens(col(textCol)).as("t")))
    val dl = toked.select(col("did"), size(col("t")).as("dl"))
    // corpus stats: a single K=1 aggregate, broadcast into the score
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val tf = toked
      .select(col("did"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("did", "tok")
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("dfreq"))

    tf.join(broadcast(dfq), "tok")
      .join(dl, "did")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n") - col("dfreq") + lit(0.5)) /
            (col("dfreq") + lit(0.5)) + lit(1.0)) *
          col("tf") * lit(k1 + 1) /
          (col("tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("did").as(idCol))
      .agg(round(sum("contrib"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }
}
