package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-based quality classifier — the FineWeb-Edu recipe
  * (Penedo et al. 2024): a small linear head, trained offline against
  * LLM-annotated quality labels, scores every document's embedding and
  * the keep/drop policy thresholds the score. The head here is the
  * COMMITTED fixture trained by `scripts/gen_embed_quality_fixture.py`
  * (plain-numpy logistic regression on the sf0.001 embeddings against
  * the synthetic `label <= 4` target); a production head drops in as
  * the same two literals (weights, bias).
  *
  * Honesty note (from the trainer, kept here on purpose): the synthetic
  * embeddings carry only a whisper of label structure (within-label
  * mean cosine ~0.02 vs ~0.00 across), so the committed head is
  * in-sample-learnable (0.646 at sf0.001, pinned by the spec) but sits
  * near chance on other SF dirs. The engine artifact is the MECHANISM —
  * distributed scoring of a committed linear head with oracle-exact
  * replay — not the synthetic head's generalization.
  *
  * Scale shape: the weights ship as inline literals (no side table, no
  * broadcast), scoring is one codegen'd map over the embeddings scan —
  * zero shuffle at any corpus size. The head-to-head join against the
  * text-feature classifier is an equi-join on the id columns, which a
  * co-partitioned layout (or AQE) handles at 100 TB; nothing in either
  * score path needs the other's columns until the final join.
  *
  * Replay contract: the dot product folds elementwise in index order
  * (Similarity.dot), matching DuckDB's `list_dot_product` over the same
  * 6dp decimal literals; both engines parse identical decimals to
  * identical doubles, so ROUND(sigmoid, 6) hash-matches. */
object EmbedQuality {

  val dim: Int = 64

  // trained by scripts/gen_embed_quality_fixture.py on /root/testdata/sf0.001
  // in-sample accuracy (6dp-rounded score, >=0.5): 0.646
  val bias: Double = -0.034414
  val weights: Array[Double] = Array(
    -0.012607, 0.160868, -0.063292, -0.14217, 0.358365, -0.180903,
    0.174287, 0.178917, -0.409393, 0.331534, 0.176651, 0.18935,
    -0.434108, 0.040545, 0.0891, -0.155256, -0.246297, -0.263282,
    0.124197, 0.097112, -0.328916, -0.228495, -0.26468, -0.646294,
    0.236634, 0.088462, -0.508753, 0.040317, -0.159855, 0.215827,
    -0.029419, 0.244162, 0.502163, 0.145367, -0.333139, -0.115691,
    0.041309, -0.129804, -0.458963, -0.111612, -0.080578, -0.189435,
    0.052759, 0.095341, 0.055828, 0.236303, 0.677073, -0.016828,
    -0.196373, 0.322337, -0.349722, -0.263521, 0.287611, -0.01132,
    0.381405, 0.264975, -0.215808, -0.041153, -0.105375, 0.382793,
    -0.104823, 0.225085, 0.349713, -0.082301)

  /** 6dp keep-probability of the committed head over an
    * `array<float>` embedding column: `round(sigmoid(w . e + b), 6)`.
    * Index-ordered sequential fold — the DuckDB `list_dot_product`
    * replay contract. */
  def score(emb: Column): Column = {
    val w = array(weights.map(lit): _*)
    round(lit(1.0) /
      (lit(1.0) + exp(-(Similarity.dot(emb, w) + lit(bias)))), 6)
  }

  /** Per-vector scoring frame: `(vec_id, p_keep_embed, pred_keep)`.
    * `pred_keep` thresholds the ROUNDED score at 0.5 on both engines,
    * so the boundary cannot drift between them. */
  def scoreVectors(embs: DataFrame, idCol: String, embCol: String)
      : DataFrame =
    embs.select(col(idCol),
        score(col(embCol)).as("p_keep_embed"))
      .withColumn("pred_keep",
        (col("p_keep_embed") >= 0.5).cast("boolean"))

  /** Head-to-head readout vs the text-feature classifier (the
    * q_langid_accuracy precedent): join the embedding head's score to
    * the handcrafted head's score on `docId == vecId`, take the
    * shared synthetic target `label <= 4`, and emit one row per
    * method with n, accuracy, and mean score. Both methods see the
    * SAME joined row set, so the comparison is paired. The expected
    * readout on the synthetic corpus: the embed head wins in-sample
    * (sf0.001) and both sit near chance elsewhere — that asymmetry is
    * the honest signal the trainer's fixture documents. */
  def headToHead(docs: DataFrame, embs: DataFrame,
      docIdCol: String, textCol: String,
      vecIdCol: String, embCol: String, labelCol: String)
      : DataFrame = {
    val scored = graft.functions.TextFunctions
      .withQualityScore(docs.select(col(docIdCol), col(textCol)),
        textCol, "p_text")
      .join(embs.select(col(vecIdCol).as(docIdCol),
          score(col(embCol)).as("p_embed"),
          (col(labelCol) <= 4).cast("boolean").as("__y")),
        Seq(docIdCol))
    // mean score via the integral trick (both scores are 6dp-rounded,
    // so p*1e6 rounds to an exact long): the cross-row sum is integer
    // arithmetic, not an order-dependent double fold
    val perMethod = (method: String, p: Column) =>
      scored.agg(count(lit(1)).as("n"),
          sum(when((p >= 0.5) === col("__y"), 1L).otherwise(0L))
            .as("__ok"),
          sum(round(p * 1e6, 0).cast("long")).as("__sm"))
        .select(lit(method).as("method"), col("n"),
          round(col("__ok").cast("double") / col("n"), 6)
            .as("accuracy"),
          round(col("__sm").cast("double") / 1e6 / col("n"), 6)
            .as("mean_score"))
    perMethod("embed_head", col("p_embed"))
      .unionAll(perMethod("text_features", col("p_text")))
  }
}
