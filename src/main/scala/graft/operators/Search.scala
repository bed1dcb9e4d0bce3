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

  /** Lexical near-duplicate pairs by FULL-vocabulary tf-idf cosine,
    * with rare-token candidate generation — the classic two-phase IR
    * design: a cheap candidate pass (docs sharing at least one token
    * whose document frequency is <= maxDfFrac * N, and optionally
    * <= maxDfAbs) bounds the quadratic work, then the exact cosine is
    * computed over the candidates' complete smoothed-tf-idf vectors
    * (idf = ln((N+1)/(df+1))), so the reported similarity is the true
    * one, not a pruned-subspace artifact.
    *
    * Shape at 100 TB: the self-join runs ONLY on rare-token postings
    * (per-token fanout <= df^2 with df capped — production sets
    * `maxDfAbs` to a constant like 1000, making candidate volume
    * linear in corpus size); the dot-product joins are candidate-
    * bounded; norms are one per-doc agg. Nothing quadratic in N ever
    * materializes. Output: (doc1, doc2, cos) with doc1 < doc2,
    * cos >= minCos, 6dp. */
  def lexicalCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDfFrac: Double = 0.7, minCos: Double = 0.75,
      maxDfAbs: Long = Long.MaxValue): DataFrame = {
    val p0 = TrackedCaches.persist(docs
      .select(col(idCol).as("did"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("did", "tok").agg(count(lit(1)).as("tf")))
    val stats = p0.agg(count_distinct(col("did")).as("n"))
    val dfreq = p0.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    val w = TrackedCaches.persist(p0.join(dfreq, "tok")
      .crossJoin(broadcast(stats))
      .select(col("did"), col("tok"),
        (col("tf") * log((col("n") + lit(1.0)) / (col("dfreq") + lit(1.0))))
          .as("w")))
    val rare = p0.join(dfreq, "tok").crossJoin(broadcast(stats))
      .where(col("dfreq") <= col("n") * maxDfFrac &&
        col("dfreq") <= maxDfAbs)
      .select("did", "tok")
    val cand = rare.as("a").join(rare.as("b"),
        col("a.tok") === col("b.tok") && col("a.did") < col("b.did"))
      .select(col("a.did").as("d1"), col("b.did").as("d2")).distinct()
    val norms = w.groupBy("did").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = cand
      .join(w.select(col("did").as("d1"), col("tok"), col("w").as("wa")),
        Seq("d1"))
      .join(w.select(col("did").as("d2"), col("tok"), col("w").as("wb")),
        Seq("d2", "tok"))
      .groupBy("d1", "d2").agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("did").as("d1"), col("nrm").as("n1")), "d1")
      .join(norms.select(col("did").as("d2"), col("nrm").as("n2")), "d2")
      .select(col("d1").as("doc1"), col("d2").as("doc2"),
        when(col("n1") * col("n2") > 0,
          round(col("dot") / (col("n1") * col("n2")), 6)).as("cos"))
      .where(col("cos") >= minCos)
  }

  /** Capped inverted index: per token, the document frequency plus the
    * first `cap` doc ids (ascending) as a comma-joined posting string.
    *
    * Scale design: full posting lists are corpus-sized per hot token —
    * collecting them into one reducer row is the anti-pattern. The cap
    * is enforced BEFORE the list aggregate by a per-token row_number
    * rank filter, which Spark compiles to WindowGroupLimit: map tasks
    * pre-trim every token to its local top-`cap` ids before the
    * shuffle, so reducer state is O(cap) per token no matter how hot
    * the token is. The exact df comes from a separate count aggregate
    * (mergeable, map-side combined) joined back on the vocabulary-sized
    * frame. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      cap: Int = 20): DataFrame = {
    require(cap >= 1, s"bad cap: $cap")
    // cached: the tokenize + corpus-wide distinct feeds BOTH the df
    // count and the capped postings branch (no cross-branch CSE)
    val pairs = TrackedCaches.persist(docs
      .select(col(idCol).as("did"), explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .distinct())
    val dfCounts = pairs.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("tok").orderBy("did")
    val capped = pairs
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= cap)
      .groupBy("tok")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(col("did"))),
          x => x.cast("string"))).as("postings"))
    dfCounts.join(capped, "tok").select("tok", "df", "postings")
  }

  /** Reciprocal-rank fusion across retrievers: input is a long frame
    * `(queryCol, rankerCol, idCol, scoreCol)` of per-query candidate
    * lists (df-/K-bounded upstream — candidate generation, not this
    * fusion, is where scale lives); each (query, ranker) list is
    * ranked `(score DESC, id)` — fully deterministic — and every
    * candidate scores `Σ_r 1/(k + rank_r)`, the fusion that needs NO
    * score calibration across retrievers (only ranks), which is why
    * it is the default way to merge BM25 with embedding cosine. Top
    * `topK` per query by `(rrf DESC, id)`; the rank windows partition
    * by (query, ranker), so Spark compiles the per-query trims to
    * WindowGroupLimit — no global sort anywhere. */
  def rrfFuse(rankings: DataFrame, queryCol: String, rankerCol: String,
      idCol: String, scoreCol: String, k: Int = 60, topK: Int = 10)
      : DataFrame = {
    require(k >= 1, s"bad k: $k")
    require(topK >= 1, s"bad topK: $topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol, rankerCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    val fused = rankings
      .withColumn("__r", row_number().over(w))
      .groupBy(queryCol, idCol)
      .agg(count(lit(1)).as("n_rankers"),
        round(sum(lit(1.0) / (lit(k) + col("__r"))), 6).as("rrf"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol)
      .orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("__fr", row_number().over(wq))
      .filter(col("__fr") <= topK)
      .drop("__fr")
  }
}
