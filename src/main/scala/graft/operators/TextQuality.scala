package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Gopher-style document-quality signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", table A1 repetition/shape rules) for
  * training-data curation at corpus scale.
  *
  * Everything is one projection over codegen'd built-ins except
  * top-token dominance, which uses the scalable explode -> two-level
  * aggregation (partial map-side combine on (doc, token), then a K-row
  * per-doc agg) instead of an O(tokens^2) per-row HOF — the formulation
  * that survives a 100 TB corpus. */
object TextQuality {

  private def par(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Per-document signals: mean word length, duplicate-bigram fraction,
    * alphabetic-token fraction, top-token dominance (most frequent
    * token's share of all tokens). All 6dp-rounded, ANSI-oracle-checked
    * (`q_gopher_quality`). */
  def gopherSignals(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // numbered did-keyed repartition: small parquet arrives as one
    // partition and the per-row HOFs would serialize onto one core
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .repartition(par(df), col("doc_id"))
    val shape = base.select(col("doc_id"),
      round(meanTokenLen(col("txt")), 6).as("mean_word_len"),
      round(dupNgramFrac(col("txt"), 2), 6).as("dup_bigram_frac"),
      round(alphaTokenFrac(col("txt")), 6).as("alpha_token_frac"))
    val top = base
      .select(col("doc_id"), explode(tokens(col("txt"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max("c").cast("double") / sum("c"), 6)
        .as("top_token_frac"))
    shape.join(top, "doc_id")
  }

  /** The standard curation pass in one call: quality-score floor,
    * repetition ceiling, then exact dedup (min-id survivor per
    * normalized text) — filter BEFORE dedup so the hash-agg shuffles
    * only the kept fingerprints. Output: surviving doc ids with their
    * signals; every stage is an ANSI-pinned building block, so the whole
    * pipeline is oracle-checkable (`q_curate`). */
  def curate(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.5, maxRepetition: Double = 0.9): DataFrame = {
    val scored = df.select(col(idCol).as("doc_id"),
      col(textCol).as("txt"),
      qualityScore(col(textCol)).as("quality"),
      repetitionRatio(col(textCol)).as("rep_ratio"))
    val kept = scored
      .filter(col("quality") >= minQuality &&
        col("rep_ratio") <= maxRepetition)
    Dedup.dedupExact(kept, "doc_id", "txt")
      .select("doc_id", "quality", "rep_ratio")
  }

  /** Top-k TF-IDF terms per document — the standard corpus-analysis /
    * keyword-extraction pass. Scale shape: explode -> partial-combined
    * (doc, term) counts, a vocabulary-sized document-frequency aggregate
    * joined back by term (equi-join; vocabulary << corpus), and ONE
    * per-doc window for the top-k. Scores are `tf * ln(N/df)` rounded to
    * 6dp BEFORE ranking so the (score desc, term asc) order is
    * engine-stable for the DuckDB oracle. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .repartition(par(df), col("doc_id"))
      .select(col("doc_id"), explode(split(col("txt"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val ndocs = df.select(countDistinct(col(idCol)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(ndocs))
      .withColumn("score",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("score"))
  }

  /** Keep documents whose token count lies inside the corpus's
    * [loQ, hiQ] quantile band — the standard outlier-length filter
    * (too-short fragments, too-long concatenation junk). Quantiles are
    * DISCRETE (type-1 inverted CDF, `percentile_disc` ==
    * DuckDB `quantile_disc`): the thresholds are actual data values,
    * so comparisons carry no interpolation float noise — an
    * interpolated threshold differs across engines by an ulp exactly
    * when a data value sits ON it (observed, 3.4% of bins flipped).
    * One bounded-state aggregation, then a map-only filter. Output:
    * (doc_id, n_tok) for the kept docs. */
  def lengthBand(df: DataFrame, idCol: String, textCol: String,
      loQ: Double = 0.1, hiQ: Double = 0.9): DataFrame = {
    require(0 <= loQ && loQ < hiQ && hiQ <= 1, s"bad band [$loQ, $hiQ]")
    val counted = df.select(col(idCol).as("doc_id"),
      graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long").as("n_tok"))
    val bounds = counted.agg(
      expr(s"percentile_disc($loQ) WITHIN GROUP (ORDER BY n_tok)")
        .as("lo"),
      expr(s"percentile_disc($hiQ) WITHIN GROUP (ORDER BY n_tok)")
        .as("hi"))
    counted.crossJoin(broadcast(bounds))
      .filter(col("n_tok") >= col("lo") && col("n_tok") <= col("hi"))
      .select("doc_id", "n_tok")
  }

  /** Per-document token-distribution Shannon entropy in bits — the
    * gibberish/boilerplate detector (near-zero entropy = one token
    * repeated; high entropy at short length = random noise) CCNet-class
    * pipelines threshold alongside LM perplexity. Computed as
    * `log2(n) - sum(c*log2(c))/n` over within-doc token counts: the
    * explode -> (doc, token) partial-combined agg -> K-row per-doc agg
    * shape (same as top-token dominance — no O(tokens^2) HOF), so the
    * shuffle carries counts, never text beyond single tokens. log2 via
    * ln(x)/ln(2) on BOTH engines (the oracle replays the same
    * expression), 4dp-rounded against cross-engine sum order. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val log2 = (c: org.apache.spark.sql.Column) => log(c) / log(lit(2.0))
    df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"),
        sum(col("c") * log2(col("c"))).as("s"))
      .select(col("doc_id"),
        col("n").as("n_tok"),
        round(log2(col("n")) - col("s") / col("n"), 4).as("entropy_bits"))
  }

  /** Per-document character-class composition — the script-mix signal
    * multilingual pipelines route on (a "Latin" doc drowning in digits
    * or symbol soup is a different cleaning problem than prose).
    * Fractions of alphabetic / digit / whitespace / other characters,
    * counted by deleting each class and differencing lengths: pure
    * codegen'd regexp projection, map-only, no shuffle. 6dp. */
  def scriptMix(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val n = length(col(textCol))
    def frac(re: String) = round(
      when(n === 0, 0.0).otherwise(
        (n - length(regexp_replace(col(textCol), re, ""))) / n), 6)
    // whitespace is the EXPLICIT class Java's \s denotes — RE2 (the
    // DuckDB oracle) excludes \x0B from its \s, so a shorthand here
    // would silently diverge on vertical-tab the day a corpus has one
    val ws = " \\t\\n\\x0B\\f\\r"
    df.select(col(idCol),
      n.cast("long").as("n_chars"),
      frac("[A-Za-z]").as("alpha_frac"),
      frac("[0-9]").as("digit_frac"),
      frac(s"[$ws]").as("space_frac"),
      frac(s"[^A-Za-z0-9$ws]").as("other_frac"))
  }

  /** Per-group winsorization: clamp `valCol` into its group's
    * [loQ, hiQ] exact quantile band — the outlier-robust feature
    * normalization step ahead of z-scoring or classifier training
    * (heavy-tailed doc lengths otherwise dominate any moment-based
    * calibration). One bounded-state `percentile_disc` aggregation
    * (K groups x 2 longs to the join), then a broadcast probe +
    * map-only clamp — the corpus never shuffles. Appends
    * `<valCol>_w`. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(0 <= loQ && loQ < hiQ && hiQ <= 1, s"bad band [$loQ, $hiQ]")
    // percentile_disc always returns an ACTUAL data value but types it
    // double — cast back so the clamped column keeps the input dtype
    val vt = df.schema(valCol).dataType
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile_disc($loQ) WITHIN GROUP (ORDER BY $valCol)")
        .cast(vt).as("__lo"),
      expr(s"percentile_disc($hiQ) WITHIN GROUP (ORDER BY $valCol)")
        .cast(vt).as("__hi"))
    df.join(broadcast(bounds), groupCol)
      // greatest/least skip NULLs, which would rewrite a missing value
      // to the P-lo bound — a NULL measurement must stay NULL
      .withColumn(s"${valCol}_w",
        when(col(valCol).isNotNull,
          least(greatest(col(valCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Robust (median/MAD) outlier score per group — the heavy-tail-safe
    * alternative to the mean/stddev z-score (`zscorePerGroup`): one
    * boilerplate page of a million duplicated chars shifts a mean
    * z-score's own baseline, but not the median's. rz = (x - med) /
    * (1.4826 * mad), the standard normal-consistency scaling; |rz| >
    * 3.5 is the usual outlier flag (Iglewicz-Hoaglin).
    *
    * Exactness: median AND mad are `percentile_disc` (type-1) values —
    * actual data points, bit-identical on every engine — so the whole
    * score replays in SQL. Scale shape: two K-row grouped quantile
    * aggregates broadcast back onto the corpus; the corpus itself
    * never shuffle-joins. A zero MAD (>50% of the group at one value)
    * yields NULL rz, never a division blow-up. */
  def robustZ(df: DataFrame, groupCol: String, valCol: String)
      : DataFrame = {
    val med = df.groupBy(groupCol).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valCol)")
        .as("med"))
    val withMed = df.join(broadcast(med), groupCol)
      .withColumn("__absdev", abs(col(valCol) - col("med")))
    val mad = withMed.groupBy(groupCol).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __absdev)")
        .as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("rz",
        when(col("mad") > 0,
          round((col(valCol) - col("med")) / (lit(1.4826) * col("mad")), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("rz")) > 3.5, lit(false)))
      .drop("__absdev")
  }

  /** Quantile-threshold score binning — the scale-correct alternative
    * to `ntile(k) OVER (ORDER BY score)`: a global ntile funnels the
    * whole corpus through ONE ordered reducer, while here the k-1 exact
    * quantile thresholds come from one bounded aggregation and the bin
    * assignment is a map-only comparison against the broadcast
    * thresholds. Bin = 1 + number of thresholds strictly below the
    * score (ties land in the lower bin on the threshold itself), so
    * equal scores always share a bin — unlike ntile, which splits ties
    * by arbitrary row order. Thresholds are DISCRETE (type-1) quantiles
    * — actual score values, exact on every engine, where interpolated
    * ones differ by an ulp precisely when a score sits on them.
    * Output: (doc_id, score, bin 1..k). */
  def scoreBins(df: DataFrame, idCol: String, scoreCol: String, k: Int)
      : DataFrame = {
    require(k >= 2, s"need k >= 2 bins: $k")
    val qs = (1 until k).map(i => i.toDouble / k)
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY $scoreCol)")
        .as(s"t$i")
    }
    val thresholds = df.agg(aggs.head, aggs.tail: _*)
      .select(array(qs.indices.map(i => col(s"t$i")): _*).as("ts"))
    df.select(col(idCol).as("doc_id"), col(scoreCol).as("score"))
      .crossJoin(broadcast(thresholds))
      .select(col("doc_id"), col("score"),
        (lit(1) + aggregate(col("ts"), lit(0),
          (acc, t) => acc + when(col("score") > t, 1).otherwise(0)))
          .as("bin"))
  }

  /** CCNet-style n-gram LM quality score (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): fit an add-alpha-smoothed bigram model on a REFERENCE
    * corpus, then score each document by the mean negative log
    * probability of its bigrams — lower = more reference-like; `exp`
    * of it is the perplexity that curation pipelines threshold on.
    *
    * `P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * |V|)` with
    * `c(w1)` the context count (occurrences of w1 followed by anything)
    * and `|V|` the reference vocabulary size; an unseen context scores
    * the uniform `1/|V|`.
    *
    * Scale shape: the model is two bounded aggregations over the
    * reference (bigram + context counts — vocabulary-bounded dim
    * tables at ANY corpus size, so Spark can broadcast them when small
    * and equi-join otherwise); scoring is one join of document bigrams
    * against the model plus a per-doc mean. No driver loops, no UDFs.
    * Documents with fewer than 2 tokens emit nothing (no bigram to
    * score). Output: (doc_id, nlp) at 6dp. */
  def ngramLogProb(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    def bigrams(df: DataFrame): DataFrame =
      df.filter(length(trim(col(textCol))) > 0)
        .select(col(idCol).as("doc_id"),
          graft.functions.TextFunctions.tokens(col(textCol)).as("ts"))
        .repartition(par(df), col("doc_id"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val refBg = bigrams(reference)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val refCtx = refBg.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = reference.filter(length(trim(col(textCol))) > 0)
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bigrams(docs)
      .join(refBg, Seq("w1", "w2"), "left")
      .join(refCtx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (-log((coalesce(col("c2"), lit(0L)) + alpha) /
          (coalesce(col("c1"), lit(0L)) + col("v") * alpha))).as("lp"))
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 6).as("nlp"))
  }

  /** CCNet-style head/middle/tail perplexity bucketing per language
    * (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data"): exact type-1 tercile thresholds of
    * the [[ngramLogProb]] score WITHIN each language, `head` = the most
    * reference-like third. Per-language thresholds matter because LM
    * scores are not comparable across languages.
    *
    * Scale shape: the scored table is cached once (two consumers), the
    * thresholds are a bounded-state `percentile_disc` aggregate — one
    * row per language, broadcast back — so there is no global sort and
    * no per-language collect; bucketing is a map-only CASE. Thresholds
    * compare the 6dp-rounded scores, making the boundary assignment
    * engine-stable (oracle `q_ppl_buckets`). */
  def pplBuckets(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    val wl = TrackedCaches.persist(
      ngramLogProb(docs, reference, idCol, textCol)
        .join(docs.select(col(idCol).as("doc_id"),
          col(langCol).as("lang")), "doc_id"))
    val th = wl.groupBy("lang").agg(
      expr("percentile_disc(0.3333333333) WITHIN GROUP (ORDER BY nlp)")
        .as("q33"),
      expr("percentile_disc(0.6666666667) WITHIN GROUP (ORDER BY nlp)")
        .as("q66"))
    wl.join(broadcast(th), "lang")
      .select(col("doc_id"), col("lang"), col("nlp"),
        when(col("nlp") <= col("q33"), lit("head"))
          .when(col("nlp") <= col("q66"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Corpus collocations: top-k adjacent-token pairs by pointwise
    * mutual information, `pmi = ln(P(a,b) / (P(a) P(b)))` with unigram
    * probabilities over all tokens and pair probabilities over all
    * adjacent pairs. `minCount` floors the pair count (PMI of rare
    * pairs is noise — the classic Church & Hanks caveat).
    *
    * Scale shape: tokens and pairs are aggregated FIRST (map-side
    * partial combine), so the joins run vocab-sized x vocab-sized, not
    * corpus-sized; the two corpus totals ride in as one-row broadcast
    * cross joins; the final top-k is TakeOrdered (no global sort). The
    * PMI arithmetic fixes the multiply/divide order so both engines
    * produce bit-identical doubles before the 6dp round. */
  def pmiTopPairs(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    // tokenize ONCE: unigram and bigram explodes both feed off the
    // cached token arrays instead of re-parsing the text per branch
    val tk = TrackedCaches.persist(
      df.select(tokens(col(textCol)).as("t")))
    val toks = tk.select(explode(col("t")).as("tok"))
    val unigrams = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val nTok = broadcast(unigrams.agg(sum("c").as("n_tok")))
    val bi = when(size(col("t")) >= 2,
      transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", slice(col("t"), i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val pairCounts = tk
      .select(explode(bi).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c_ab"))
    // the pair total is over ALL adjacent pairs (true P(a,b)), not just
    // the ones surviving the count floor
    val nPair = broadcast(pairCounts.agg(sum("c_ab").as("n_pair")))
    val pairs = pairCounts
      .filter(col("c_ab") >= minCount)
      .select(split(col("pair"), " ").getItem(0).as("tok_a"),
        split(col("pair"), " ").getItem(1).as("tok_b"), col("c_ab"))
    pairs
      .join(unigrams.withColumnRenamed("tok", "tok_a")
        .withColumnRenamed("c", "c_a"), "tok_a")
      .join(unigrams.withColumnRenamed("tok", "tok_b")
        .withColumnRenamed("c", "c_b"), "tok_b")
      .crossJoin(nTok).crossJoin(nPair)
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        round(log(
          (col("c_ab").cast("double") * col("n_tok") * col("n_tok")) /
            (col("n_pair").cast("double") * col("c_a") * col("c_b"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
  }

  /** Flesch reading-ease per document — the classic readability score
    * used as a cheap quality signal (too-easy AND too-hard tails are
    * both curation targets):
    * `206.835 - 1.015 * words/sentences - 84.6 * syllables/words`.
    * Sentences = runs of [.!?] floored at 1; syllables = vowel-group
    * runs `[aeiouy]+` — the standard regex approximation, map-only
    * codegen'd `regexp_count`, identical RE semantics in ANSI SQL so
    * the score replays exactly. Zero-word docs yield NULL. */
  def readability(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = lower(col(textCol))
    df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_words"),
        greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
          .as("n_sents"),
        regexp_count(t, lit("[aeiouy]+")).cast("long").as("n_syll"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * col("n_words") / col("n_sents") -
            lit(84.6) * col("n_syll") / col("n_words"), 4)))
  }

  /** Heaps-law vocabulary-growth coefficient per source:
    * `beta = ln(V) / ln(N)` for V distinct tokens over N total tokens.
    * Healthy natural text sits near 0.5-0.6; beta near 1 means nearly
    * every token is new (random ids, hashes), near 0 means extreme
    * repetition (boilerplate) — both are curation red flags the
    * zipf-slope stat misses (it needs a rank curve; this is two
    * aggregates). One tokenize+explode, one grouped count+distinct. */
  def heapsLaw(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame =
    df.select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("n_distinct"))
      .withColumn("beta",
        when(col("n_tokens") > 1,
          round(log(col("n_distinct").cast("double")) /
            log(col("n_tokens").cast("double")), 6)))

  /** Interpolated Kneser-Ney bigram probabilities — the standard
    * smoothed n-gram LM estimate (Kneser & Ney 1995; the Chen-Goodman
    * formulation with one fixed absolute discount):
    *
    *   P_kn(b|a) = max(c(a,b) - D, 0) / c(a,.)
    *             + (D * N1+(a,.) / c(a,.)) * N1+(.,b) / N1+(.,.)
    *
    * where N1+ are DISTINCT-neighbor counts (the continuation counts
    * that make KN better than Katz at reusing frequent-word mass).
    * Everything is count algebra over two hash aggregates — fully
    * ANSI-expressible, so the oracle replays it exactly; no special
    * functions, no iteration.
    *
    * Scale shape: one cached tokenize pass feeds the bigram explode;
    * counts/distinct-counts are partial-aggregated map-side; the four
    * stat frames that join back are vocab-sized. Output: the `topK`
    * bigrams by (count desc, pair asc) with 6dp `pkn`. */
  def kneserNeyTop(df: DataFrame, textCol: String, discount: Double = 0.75,
      topK: Int = 50): DataFrame = {
    require(discount > 0 && discount < 1, s"bad discount: $discount")
    val tk = TrackedCaches.persist(
      df.select(tokens(col(textCol)).as("t")).where(size(col("t")) >= 2))
    val bi = tk.select(explode(
        transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pc = TrackedCaches.persist(
      bi.groupBy("a", "b").agg(count(lit(1)).as("c_ab")))
    val left = pc.groupBy("a")
      .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1p_a"))
    val right = pc.groupBy("b").agg(count(lit(1)).as("n1p_b"))
    val types = broadcast(pc.agg(count(lit(1)).as("n_types")))
    pc.join(left, "a").join(right, "b").crossJoin(types)
      .select(col("a").as("tok_a"), col("b").as("tok_b"), col("c_ab"),
        round(
          greatest(col("c_ab") - discount, lit(0.0)) / col("c_a") +
            (lit(discount) * col("n1p_a") / col("c_a")) *
              (col("n1p_b").cast("double") / col("n_types")), 6)
          .as("pkn"))
      .orderBy(col("c_ab").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
  }

  /** Cross-source quantile normalization of an INTEGRAL score: every
    * row's value is replaced by the GLOBAL value at the row's quantile
    * within its own source — the standard fix when per-source scoring
    * models are miscalibrated against each other (a "0.8" from one
    * scorer is not a "0.8" from another; ranks are comparable, raw
    * scores are not).
    *
    * Exact type-1 formulation so the result is oracle-replayable:
    * r = (rank_in_source - 1) / (n_source - 1) (singleton source ->
    * r = 0), target index = floor(r * (N - 1)) + 1 into the global
    * (value, id) order, target value looked up by equi-join.
    *
    * Shuffles: one group-key window, one bounded-shard value rank
    * ([[GlobalOrder.valueRank]] — no single-reducer sort), one
    * equi-join on the index. All corpus-width but hash-partitioned;
    * nothing funnels through one task. */
  def quantileNormalize(df: DataFrame, groupCol: String, valCol: String,
      idCol: String): DataFrame = {
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    // cached: the (possibly expensive upstream) input otherwise scans
    // ~5x — the count, the rank window, and valueRank's stats/counts/
    // output passes
    val in = TrackedCaches.persist(df.filter(col(valCol).isNotNull))
    val n = in.count()
    val ranked = in
      .withColumn("__rn", row_number().over(wS))
      .withColumn("__ns", count(lit(1)).over(wG))
      .withColumn("__gi",
        floor(when(col("__ns") > 1,
            (col("__rn") - 1).cast("double") /
              (col("__ns") - 1).cast("double"))
          .otherwise(lit(0.0)) * lit((n - 1).toDouble)).cast("long")
          + lit(1L))
    val lut = GlobalOrder.valueRank(
        in.select(col(idCol), col(valCol)), valCol, idCol)
      .select(col("global_pos").as("__gi"),
        col(valCol).cast("long").as("qnorm"))
    ranked.join(lut, "__gi")
      .select(col(idCol), col(groupCol), col(valCol), col("qnorm"))
  }

  /** Hashing-trick term-frequency featurization: every token occurrence
    * lands in `dims` buckets via an md5-derived hash, yielding a sparse
    * (doc, bucket, tf) long-form vector — the classic fixed-width
    * featurizer for linear quality classifiers when the vocabulary is
    * unbounded. md5 (not the JVM's murmur) so the bucket assignment is
    * engine-independent and the whole featurization is oracle-exact.
    * Map-side explode + one combined hash aggregate; output is bounded
    * by docs x dims, not by vocabulary. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 64): DataFrame = {
    require(dims >= 1, s"bad dims: $dims")
    docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col(idCol),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % dims).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-source out-of-vocabulary rate against the corpus-global top-K
    * vocabulary — the tokenizer-coverage audit run before committing a
    * vocab: a source whose OOV rate spikes is about to fragment into
    * byte-level tokens and blow its fertility. Vocabulary = top `topK`
    * tokens by corpus frequency, `(freq DESC, token)` tie-broken so
    * both engines pick the identical set.
    *
    * Scale shape: ONE corpus tokenization pass reduced immediately to
    * the (source, token) count frame — everything downstream
    * (vocabulary top-K, the coverage join, the per-source aggregate)
    * is vocab- x source-sized; the top-K is a K-bounded ordered limit
    * and the membership join broadcasts. */
  def vocabCoverage(docs: DataFrame, sourceCol: String, textCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK >= 1 && topK <= 1000000, s"bad topK: $topK")
    val counts = TrackedCaches.persist(docs
      .select(col(sourceCol).as("__src"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("__src", "tok").agg(count(lit(1)).as("c")))
    val vocab = counts.groupBy("tok").agg(sum("c").as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(topK)
      .select(col("tok"), lit(1).as("__in"))
    counts.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("__src").as(sourceCol))
      .agg(sum("c").as("n_tokens"),
        sum(when(col("__in").isNull, col("c")).otherwise(0L))
          .as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens") / col("n_tokens").cast("double"), 6))
  }

  /** Unicode-script mix per document — the multilingual-corpus triage
    * (route by script before language-ID; catch mixed-script spam).
    * Counts characters in EXPLICIT codepoint ranges (Latin letters,
    * Cyrillic U+0400-04FF, Greek U+0370-03FF, CJK unified U+4E00-9FFF,
    * Arabic U+0600-06FF, ASCII digits) rather than `\\p{script=}`
    * classes, so the counts are regex-engine-neutral (Java and RE2
    * script tables drift; codepoint ranges don't). `dominant` is the
    * argmax with ties to the order above; 'none' when no class hits.
    * Map-only, codegen'd. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val classes = Seq(
      "latin" -> "[A-Za-z]",
      "cyrillic" -> "[Ѐ-ӿ]",
      "greek" -> "[Ͱ-Ͽ]",
      "cjk" -> "[一-鿿]",
      "arabic" -> "[؀-ۿ]",
      "digit" -> "[0-9]")
    val counted = classes.foldLeft(
      df.filter(col(textCol).isNotNull).select(col(idCol),
        col(textCol).as("__t"), length(col(textCol)).as("n_chars"))) {
      case (d, (name, pat)) => d.withColumn(s"n_$name",
        (col("n_chars") - length(regexp_replace(col("__t"), pat, "")))
          .cast("long"))
    }
    val maxc = greatest(classes.map(c => col(s"n_${c._1}")): _*)
    val dominant = classes.foldLeft(when(maxc === 0, lit("none"))) {
      case (acc, (name, _)) =>
        acc.when(col(s"n_$name") === maxc, lit(name))
    }
    counted.select(col(idCol) +: col("n_chars").cast("long").as("n_chars") +:
      classes.map { case (name, _) => col(s"n_$name") } :+
      dominant.as("dominant"): _*)
  }

  /** Top word-n-gram share per document — the Gopher-style repetition
    * signal at n-gram granularity ("one bigram is 40% of the doc" =
    * templated boilerplate). Tokens are lowercased whitespace splits;
    * documents with fewer than `n` tokens are dropped (no n-grams).
    * Output: `(id, n_ngrams, top_gram, top_count, top_share)` — all
    * ratios integral-numerator, ties on the count break to the
    * lexicographically smallest gram. Scale shape: one explode + one
    * (id, gram) hash aggregate + a rank window Spark trims map-side
    * via WindowGroupLimit. */
  def topNgramShare(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 10, s"bad n: $n")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = transform(
      sequence(lit(1), size(col("__toks")) - (n - 1)),
      i => concat_ws(" ", slice(col("__toks"), i, lit(n))))
    val exploded = df.filter(col(textCol).isNotNull)
      .select(col(idCol), filter(toks, t => length(t) > 0).as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(grams).as("gram"))
    val counts = exploded.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("cnt").desc, col("gram"))
    counts
      .withColumn("__tot", sum("cnt").over(Window.partitionBy(idCol)))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("__tot").as("n_ngrams"),
        col("gram").as("top_gram"), col("cnt").as("top_count"),
        round(col("cnt") / col("__tot").cast("double"), 6)
          .as("top_share"))
  }

  /** Chao1 species-richness estimate of the corpus vocabulary — "how
    * many distinct tokens does the POPULATION hold, given this
    * sample?" (Chao 1984, the bias-corrected form): `V + F1(F1−1) /
    * (2(F2+1))` where F1/F2 are the singleton/doubleton counts of the
    * token frequency spectrum — the de-dup / coverage planner's
    * "how much new vocabulary is left out there" number next to
    * Heaps' law. All inputs are integral (V, F1, F2, N from two
    * nested hash aggregates), the estimate is one exact ratio.
    * Output one row: `(n_tokens, vocab, f1, f2, chao1)`. */
  def vocabRichness(df: DataFrame, textCol: String): DataFrame = {
    val freqs = df.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("c"))
    freqs.agg(sum("c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        round(col("vocab") + col("f1") * (col("f1") - 1) /
          (lit(2.0) * (col("f2") + 1)), 4).as("chao1"))
  }

  /** Chat-transcript structure QA for SFT corpora — per conversation
    * in a `role: content` line format: turn counts per role, lines
    * that parse as NO role (`n_bad_lines`), consecutive same-role
    * turns (`n_alternation_violations` — the double-user artifact
    * that poisons turn-taking), and the integral mean tokens per
    * turn. Roles are `user|assistant|system`, ASCII-lowercase at line
    * start. Scale shape: one explode to lines, one conversation-keyed
    * window for adjacency (WindowGroupLimit-free but line-bounded),
    * one conv aggregate — every output integral or an exact ratio. */
  def chatTurnStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val lines = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("ln", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withColumn("role", regexp_extract(col("line"),
        "^(user|assistant|system):", 1))
      .withColumn("content", regexp_replace(col("line"),
        "^(user|assistant|system):\\s*", ""))
    // adjacency runs over PARSED turns only — a stray role-less line
    // between two same-role turns must not mask the violation (the
    // double-user artifact is about turn order, not line order)
    val w = Window.partitionBy(idCol).orderBy("ln")
    val turns = lines.filter(col("role") =!= "")
      .withColumn("prev_role", lag("role", 1).over(w))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L))
          .as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_alternation_violations"),
        sum(when(length(trim(col("content"))) > 0,
          size(split(trim(col("content")), "\\s+"))).otherwise(0L))
          .cast("long").as("__toks"))
    lines.groupBy(idCol)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("role") === "", 1L).otherwise(0L))
          .as("n_bad_lines"))
      .join(turns, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("n_bad_lines"),
        coalesce(col("n_user"), lit(0L)).as("n_user"),
        coalesce(col("n_assistant"), lit(0L)).as("n_assistant"),
        coalesce(col("n_alternation_violations"), lit(0L))
          .as("n_alternation_violations"),
        coalesce(col("n_turns"), lit(0L)).as("n_turns"),
        round(when(coalesce(col("n_turns"), lit(0L)) > 0,
          col("__toks") / col("n_turns").cast("double")), 4)
          .as("mean_turn_tokens"))
  }

  /** Markup lint per document — the crawl-artifact audit (HTML tags,
    * markdown headers, inline URLs, code fences) that routes docs to
    * the right cleaning pass. Pure codegen'd regexp counts, map-only;
    * `markup_rate` = markup hits per 1000 chars, an exact ratio off
    * integral counts. */
  def markupLint(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    df.filter(t.isNotNull)
      .select(col(idCol),
        length(t).cast("long").as("n_chars"),
        regexp_count(t, lit("<[a-zA-Z][^>]*>")).cast("long")
          .as("n_html_tags"),
        regexp_count(t, lit("(^|\n)#{1,6} ")).cast("long")
          .as("n_md_headers"),
        regexp_count(t, lit("https?://[^\\s]+")).cast("long")
          .as("n_urls"),
        regexp_count(t, lit("```")).cast("long").as("n_code_fences"))
      .withColumn("markup_rate",
        round(when(col("n_chars") > 0,
          (col("n_html_tags") + col("n_md_headers") +
            col("n_code_fences")) * lit(1000.0) / col("n_chars"))
          .otherwise(0.0), 4))
  }

  /** Committed toxicity seed lexicon: term -> integer severity. The
    * engine fixture for the badwords list every corpus build applies
    * (C4's blocklist, HateBERT-style lexica); severities are INTEGERS
    * so the per-document aggregation is exact. The production list
    * drops in as a broadcast table — same shape, bigger data. */
  val ToxicityLexicon: Seq[(String, Int)] = Seq(
    "hate" -> 2, "hateful" -> 2, "kill" -> 3, "die" -> 2,
    "stupid" -> 1, "idiot" -> 2, "moron" -> 2, "dumb" -> 1,
    "trash" -> 1, "garbage" -> 1, "loser" -> 1, "pathetic" -> 1,
    "disgusting" -> 2, "worthless" -> 2, "shut up" -> 1,
    "attack" -> 1, "destroy" -> 1, "violent" -> 2, "abuse" -> 2,
    "threat" -> 2)

  /** Per-document toxicity scoring against [[ToxicityLexicon]].
    * Single-word entries are token-exact (clean whitespace tokens, so
    * `hateful` does not double-fire `hate`). Multi-word entries match
    * by RAW SUBSTRING CONTAINMENT on the lowercased text — NOT
    * token-bigram-exact: `shut upward` fires `shut up`, and no
    * whitespace collapse is applied before the count. This is the C4
    * blocklist convention (plain containment) and keeps the check a
    * codegen'd expression; a token-exact phrase match would need the
    * joined clean-token stream on both the engine and oracle sides.
    * Emits hit/severity counts, a per-token normalized score, and the
    * triage bucket (`none/low/medium/high`) the keep/review/drop
    * policy keys on.
    *
    * Scale shape: explode tokens -> broadcast inner join on the
    * lexicon (only HITS survive the join — the shuffle carries
    * matched tokens, not the corpus) -> per-doc hash aggregate, then
    * a left join back to the doc frame for exact zero fill. All
    * counts integral; the score is one guarded division. */
  def toxicityScore(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val uni = ToxicityLexicon.filter(!_._1.contains(" "))
    val bi = ToxicityLexicon.filter(_._1.contains(" "))
    val lex = spark.createDataFrame(uni.map(t => (t._1, t._2)))
      .toDF("tok", "sev")
    // base feeds BOTH the explode->join hit path and the zero-fill
    // doc frame — the cache boundary stops the tokenizer running
    // twice over the corpus (and keeps pushdown from substituting it
    // into the scan, the TrackedCaches doctrine)
    val base = TrackedCaches.persist(
      df.select(col(idCol), cleanTokens(col(textCol)).as("__t"),
        lower(coalesce(col(textCol), lit(""))).as("__lc")))
    val hits = base.select(col(idCol), explode(col("__t")).as("tok"))
      .join(broadcast(lex), Seq("tok"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("h1"), sum("sev").as("s1"))
    // the rare multi-word entries ride as codegen'd substring counts
    // (bounded by lexicon size, not corpus size)
    val biHits = bi.map { case (phrase, sev) =>
      val n = occurrences(col("__lc"), phrase).cast("long")
      (n, n * sev)
    }
    val (h2, s2) =
      if (biHits.isEmpty) (lit(0L), lit(0L))
      else (biHits.map(_._1).reduce(_ + _), biHits.map(_._2).reduce(_ + _))
    base.select(col(idCol), size(col("__t")).cast("long").as("n_toks"),
        h2.as("__h2"), s2.as("__s2"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_toks"),
        (coalesce(col("h1"), lit(0L)) + col("__h2")).as("tox_hits"),
        (coalesce(col("s1"), lit(0L)) + col("__s2")).as("tox_sev"))
      .withColumn("tox_score",
        round(when(col("n_toks") > 0,
          col("tox_sev").cast("double") / col("n_toks"))
          .otherwise(0.0), 6))
      .withColumn("bucket",
        when(col("tox_hits") === 0, "none")
          .when(col("tox_score") >= 0.10, "high")
          .when(col("tox_score") >= 0.03, "medium")
          .otherwise("low"))
  }

  /** Label-conditional n-gram lift — the data-poisoning / backdoor
    * triage scan (Wallace et al. 2021-style trigger phrases): a
    * bigram whose frequency INSIDE one label class is far above its
    * corpus rate is a candidate injected trigger (or at minimum a
    * template artifact worth reviewing). `lift(g, l) =
    * (c_gl / n_l) / (c_g / N)` off four integral counts; top `topK`
    * per label by (lift DESC, gram) after a `minCount` floor.
    *
    * Shape: ONE corpus-touching aggregate to the (label, gram) count
    * frame (map-side combine keys on the gram, so repeated grams
    * collapse before the shuffle); gram and label marginals re-derive
    * FROM that frame — the corpus is exploded exactly once; the
    * final rank window runs on the minCount-filtered frame and
    * compiles to WindowGroupLimit. */
  def poisonLift(df: DataFrame, labelCol: String, textCol: String,
      minCount: Int = 5, topK: Int = 5): DataFrame = {
    require(minCount >= 1 && topK >= 1 && topK <= 1000,
      s"bad minCount/topK: $minCount/$topK")
    val t = cleanTokens(col(textCol))
    val bi = when(size(t) >= 2,
        transform(sequence(lit(0), size(t) - 2),
          i => concat(element_at(t, i + 1), lit(" "),
            element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    // the (label, gram) frame feeds THREE consumers (lift rows, gram
    // marginal, label marginal) — without the cache boundary each one
    // re-explodes the corpus from the scan (measured at sf0.1: 7.0 s
    // -> 2.5 s warm with the persist; the doc's "exploded exactly
    // once" claim is this line)
    val lg = TrackedCaches.persist(
      df.select(col(labelCol).as("label"), explode(bi).as("gram"))
        .groupBy("label", "gram").agg(count(lit(1)).as("c_lg")))
    lg.count() // materialize eagerly: the three consumer stages run
    // concurrently, and lazily-raced cache population would still
    // re-explode per stage on the cold path (12.4 -> ~4 s cold)
    val g = lg.groupBy("gram").agg(sum("c_lg").as("c_g"))
    val l = lg.groupBy("label").agg(sum("c_lg").as("n_l"))
    val tot = l.agg(sum("n_l").as("n_tot"))
    val lift = lg.filter(col("c_lg") >= minCount)
      .join(g, Seq("gram"))
      .join(broadcast(l), Seq("label"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        round((col("c_lg").cast("double") / col("n_l")) /
          (col("c_g").cast("double") / col("n_tot")), 6))
    lift.withColumn("rank", row_number().over(
        Window.partitionBy("label")
          .orderBy(col("lift").desc, col("gram"))))
      .filter(col("rank") <= topK)
      .select(col("label"), col("gram"), col("c_lg"), col("c_g"),
        col("lift"), col("rank"))
  }

  /** Green-list watermark detection (Kirchenbauer et al. 2023): a
    * watermarking sampler boosts tokens whose seeded hash lands in
    * the "green" half of the vocabulary, so watermarked text shows a
    * green fraction far above 1/2 — `z = (g - n/2) / sqrt(n/4)`, flag
    * at `z >= zThreshold` (the paper's detection test, one-proposal
    * variant keyed on the token itself). The green rule here is the
    * engine's replayable one: first hex digit of `md5(token || salt)`
    * below '8' (an exact 1/2 split both engines compute identically).
    * Map-only: token filter + integral counts per document. */
  def watermarkZScore(df: DataFrame, idCol: String, textCol: String,
      salt: String = "wm1", zThreshold: Double = 4.0): DataFrame = {
    val toks = cleanTokens(col(textCol))
    val green = filter(toks, t =>
      substring(md5(concat(t, lit(salt))), 1, 1) < "8")
    df.select(col(idCol), size(toks).cast("long").as("n_toks"),
        size(green).cast("long").as("n_green"))
      .withColumn("z_score",
        round(when(col("n_toks") > 0,
          (col("n_green").cast("double") - col("n_toks") / 2.0) /
            sqrt(col("n_toks") / 4.0)).otherwise(0.0), 6))
      .withColumn("watermarked", col("z_score") >= zThreshold)
  }

  /** Truncation audit — the serving-QA readout for completions cut
    * off by max-token limits or bad stop sequences: per config, the
    * fraction of completions that end on sentence-final punctuation
    * (after trailing whitespace/quotes strip) vs mid-stream. Pure
    * codegen'd string expressions, one integral aggregate. */
  def truncationAudit(df: DataFrame, cfgCol: String, textCol: String)
      : DataFrame = {
    val t = rtrim(coalesce(col(textCol), lit("")))
    val bare = rtrim(regexp_replace(t, "[\"')\\]]+$", ""))
    val clean = bare.rlike("[.!?]$")
    df.select(col(cfgCol).as("config"),
        when(length(t) === 0, 0L)
          .when(clean, 1L).otherwise(0L).as("__ok"),
        when(length(t) > 0, 1L).otherwise(0L).as("__ne"))
      .groupBy("config")
      .agg(count(lit(1)).as("n"),
        sum("__ne").as("n_nonempty"),
        sum("__ok").as("n_clean_end"))
      .withColumn("truncation_rate",
        round(when(col("n_nonempty") > 0,
          (col("n_nonempty") - col("n_clean_end")).cast("double") /
            col("n_nonempty")).otherwise(0.0), 6))
  }

  /** Flesch reading-ease + Flesch-Kincaid grade per document — the
    * classic curriculum/difficulty signal (Kincaid et al. 1975),
    * computed from three INTEGRAL counts: words (clean tokens),
    * sentences (runs of `.!?`, floored at 1 for any non-empty text),
    * and syllables approximated as vowel-group runs `[aeiouy]+` over
    * the lowercased text (whitespace breaks groups, so the corpus
    * count equals the per-word sum; vowel-less tokens contribute 0 —
    * a documented heuristic deviation from dictionary syllables).
    * Map-only codegen'd regexp counts; the two scores are single
    * float expressions off exact integers — oracle-exact at 6dp. */
  def fleschKincaid(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    df.filter(t.isNotNull)
      .select(col(idCol),
        size(cleanTokens(t)).cast("long").as("n_words"),
        greatest(regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
          .as("n_sentences"),
        regexp_count(lower(t), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .withColumn("reading_ease",
        round(when(col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * col("n_words") / col("n_sentences") -
            lit(84.6) * col("n_syllables") / col("n_words")), 6))
      .withColumn("fk_grade",
        round(when(col("n_words") > 0,
          lit(0.39) * col("n_words") / col("n_sentences") +
            lit(11.8) * col("n_syllables") / col("n_words") -
            lit(15.59)), 6))
  }

  /** Vocabulary coverage curve — "how much of the corpus do the top-k
    * token types cover": cumulative token-mass share at each rank
    * cut over the (count desc, token asc) type ranking. The
    * tokenizer-sizing readout (a 10k vocab covering 97% vs 97.9% is a
    * fertility decision). Counts and cumulative sums are integral;
    * the one global window runs over the VOCAB frame, not the corpus
    * (the bounded global-order class, like ksTest2). Cuts beyond the
    * vocab clamp to the last type (coverage 1). */
  def coverageCurve(df: DataFrame, textCol: String,
      cuts: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_ >= 1), s"bad cuts: $cuts")
    val counts = df
      .select(explode(cleanTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
    val byRank = Window.orderBy(col("__c").desc, col("tok"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = counts
      .withColumn("__rk", row_number().over(byRank))
      .withColumn("__cum", sum("__c").over(
        byRank.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__nt", count(lit(1)).over(tot))
      .withColumn("__tt", sum("__c").over(tot))
    val cutsDf = broadcast(df.sparkSession
      .createDataFrame(cuts.map(c => Tuple1(c.toLong)))
      .toDF("rank_cut"))
    ranked.join(cutsDf,
        col("__rk") === least(col("rank_cut"), col("__nt")))
      .select(col("rank_cut"), col("__nt").as("n_types"),
        col("__cum").as("covered_tokens"),
        col("__tt").as("total_tokens"),
        round(col("__cum").cast("double") / col("__tt"), 6)
          .as("coverage"))
  }

  /** Mixed-language (code-switching) detection per document: the
    * char-n-gram language id applied independently to the first and
    * second CHARACTER halves — a document whose halves disagree is
    * either code-switched or too short/noisy to classify, and either
    * way deserves a second look before a language-pure training
    * split trusts its label. Map-only (two codegen'd scorer chains
    * over substrings), deterministic halves via integer arithmetic. */
  def langPurity(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val half = floor(length(t) / lit(2.0)).cast("int")
    val h1 = substr(t, lit(1), half)
    val h2 = substr(t, half + 1, length(t))
    df.select(col(idCol),
        graft.functions.TextFunctions.langIdNgram(h1).as("lang_head"),
        graft.functions.TextFunctions.langIdNgram(h2).as("lang_tail"))
      .withColumn("consistent",
        col("lang_head") === col("lang_tail"))
  }

  /** Longest run of consecutive IDENTICAL tokens per document — the
    * degenerate-generation loop detector (a sampler stuck on one
    * token shows up here long before perplexity moves; the period-1
    * case of repetition-loop QA). Explode with positions, the
    * lag-change-flag running-sum trick to number runs, then two
    * bounded aggregates; every count integral — oracle-exact.
    * Documents with no tokens report 0. */
  def maxTokenRun(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(cleanTokens(col(textCol))))
    val byDoc = Window.partitionBy("__id").orderBy("pos")
    val runs = base
      .withColumn("__chg",
        when(col("col") === lag(col("col"), 1).over(byDoc), 0L)
          .otherwise(1L))
      .withColumn("__run", sum("__chg").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("__id", "__run").agg(count(lit(1)).as("__len"))
      .groupBy("__id").agg(max("__len").as("max_run"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"))
      .join(runs, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }
}
