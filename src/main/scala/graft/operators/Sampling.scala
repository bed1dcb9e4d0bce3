package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction.
  *
  * `df.sample()` is partition-RNG-based: the kept set changes with the
  * partitioning, the Spark version, and every recompute under failure —
  * unacceptable for a 100 TB curation run that must be reproducible and
  * resumable. These operators decide per ROW from a hash of a stable
  * key: keep iff the first 8 hex chars of `md5(key || salt)` — a
  * uniform 32-bit value — fall below `rate * 2^32`. Properties:
  *
  *  - map-only: no shuffle, no RNG state, survives recompute/resume;
  *  - engine-independent: md5 is standardized, so the SAME rows are
  *    kept by any engine (the DuckDB oracles replay it exactly);
  *  - seedable: `salt` re-randomizes the kept set (an INDEPENDENT
  *    draw — salted sets overlap by ~rate², so for train/eval or folds
  *    use [[trainEvalSplit]]/[[kFold]], which partition one hash);
  *  - consistent across tables: sampling two tables by the same join
  *    key keeps ALIGNED rows (the classic hash-sampling join trick).
  *
  * The threshold comparison is done on the lowercase-hex STRING
  * (8 chars), which orders identically to the numeric value — no
  * unsigned-conversion pitfalls on either engine.
  */
object Sampling {

  /** Lowercase 8-hex-char threshold for `rate` ∈ [0, 1]:
    * floor(rate * 2^32) zero-padded — "00000000" keeps nothing,
    * rate = 1 keeps everything (capped sentinel above every hash). */
  private[operators] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val n = math.floor(rate * 4294967296.0).toLong
    if (n >= 4294967296L) "g" // lexicographically above every hex char
    else f"$n%08x"
  }

  /** The 8-hex-char hash bucket of a key column (+ salt). */
  private def bucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Deterministic Bernoulli sample: keep each row iff
    * hash(key || salt) < rate. Map-only; same rows on every engine,
    * partitioning, and rerun. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(bucket(col(keyCol), salt) < lit(hexThreshold(rate)))

  /** Per-stratum deterministic sampling — the training-mix operator:
    * each stratum (e.g. source/domain/language) keeps its own fraction;
    * strata absent from `rates` keep `defaultRate`. The rate lookup is a
    * literal when-chain (rates maps are config-sized), so the whole
    * operator stays map-only with zero joins. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultRate))) { case (acc, (stratum, rate)) =>
      when(col(stratumCol) === stratum, lit(hexThreshold(rate)))
        .otherwise(acc)
    }
    df.filter(bucket(col(keyCol), salt) < thr)
  }

  /** Deterministic train/eval split: labels every row 'eval' when its
    * hash bucket falls below `evalFraction`, else 'train' — the two
    * sets are complementary and covering BY CONSTRUCTION (one hash, one
    * threshold), unlike two independent sample() calls which overlap
    * and leak. Same key → same side on every engine, partitioning, and
    * rerun. `salt` derives an INDEPENDENT split — independent splits
    * overlap, so they are NOT folds; use [[kFold]] for a partition. */
  def trainEvalSplit(df: DataFrame, keyCol: String, evalFraction: Double,
      salt: String = "", splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol,
      when(bucket(col(keyCol), salt) < lit(hexThreshold(evalFraction)),
        "eval").otherwise("train"))

  /** k-fold assignment: fold `i` = rows whose hash bucket falls in the
    * i-th of `k` equal intervals of the 32-bit range — the folds are
    * DISJOINT and COVERING by construction (a true partition of the
    * corpus), which salted independent splits are not (they overlap
    * pairwise by ~fraction² and leave rows in no eval set). Fold 0 of
    * `kFold(k)` equals the eval side of `trainEvalSplit(1.0 / k)`. */
  def kFold(df: DataFrame, keyCol: String, k: Int, salt: String = "",
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 4096, s"need 2 <= k <= 4096: $k")
    val b = bucket(col(keyCol), salt)
    val first = when(b < lit(hexThreshold(1.0 / k)), 0)
    val chain = (2 until k).foldLeft(first) { (acc, i) =>
      acc.when(b < lit(hexThreshold(i.toDouble / k)), i - 1)
    }
    df.withColumn(foldCol, chain.otherwise(k - 1))
  }

  /** Fixed-SIZE deterministic sample per stratum: the first `k` rows of
    * each stratum under hash order (ties broken by the key) — bounded
    * eval/calibration-set construction, where a fixed COUNT matters more
    * than a fixed rate. One shuffle keyed by stratum + an in-partition
    * window; a hot stratum concentrates on one reducer, so for
    * rate-style downsampling of huge strata use [[stratifiedSample]]
    * (map-only) and reserve this for bounded-k selections. */
  def topKPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(bucket(col(keyCol), salt), col(keyCol))))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Token-budget mixture: downsample each stratum so the KEPT corpus
    * hits `targetShares` of the training-token budget — mixtures are
    * specified in tokens, not documents, so per-doc rates must derive
    * from each stratum's token mass.
    *
    * The largest feasible budget without upsampling is
    * `B = min_s tokens_s / share_s` (the scarcest stratum relative to
    * its target is kept whole); stratum `s` then keeps rate
    * `share_s * B / tokens_s` of its docs by the same deterministic
    * md5-threshold rule as [[hashSample]], so the expected kept token
    * mass is `share_s * B`. Strata absent from `targetShares` are
    * dropped. Cost: ONE aggregation pass for the per-stratum token
    * totals (K rows to the driver), then the map-only filter — no
    * second shuffle, deterministic, engine-replayable.
    *
    * Shares are hit in EXPECTATION over doc-level Bernoulli keeps, not
    * exactly: stratum `s`'s realized kept-token mass has standard
    * deviation `sqrt(rate_s (1 - rate_s) * sum_i len_i^2)`, so its
    * RELATIVE error shrinks as `~ sqrt(E[len^2] / E[len]^2) / sqrt(n_s)`
    * — negligible at corpus scale, but heavy-tailed doc lengths widen
    * it (the `E[len^2]` factor); chunk first (near-uniform lengths) when
    * the realized mix must be tight on a small corpus. */
  def tokenBudgetMix(df: DataFrame, keyCol: String, stratumCol: String,
      nTokensCol: String, targetShares: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must not be empty")
    require(targetShares.values.forall(s => s > 0 && s <= 1),
      s"shares must be in (0, 1]: $targetShares")
    val tot = targetShares.values.sum
    require(math.abs(tot - 1.0) < 1e-9, s"shares must sum to 1: $tot")
    // explicit casts: a non-string stratum or a double-typed token
    // column would otherwise throw an opaque ClassCastException at the
    // driver-side collect. decimal(38,6), not double: the sum stays
    // exact (partition-merge-order-independent) for integral counts far
    // past 2^53, so the derived md5 thresholds never wobble run-to-run
    val totals = df.filter(col(stratumCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(sum(col(nTokensCol).cast("decimal(38,6)")).as("tok"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) 0.0 else r.getDecimal(1).doubleValue())).toMap
    val missing = targetShares.keySet -- totals.keySet
    require(missing.isEmpty,
      s"strata with a target share but no rows: ${missing.mkString(",")}")
    // a zero-token stratum would zero the whole budget (and make its
    // own rate NaN) — fail here with the actual cause, not downstream
    val empty = totals.collect { case (s, t) if t <= 0 => s }
    require(empty.isEmpty,
      s"strata with a target share but zero tokens: ${empty.mkString(",")}")
    val budget = targetShares.map { case (s, share) => totals(s) / share }.min
    val rates = targetShares.map { case (s, share) =>
      s -> math.min(1.0, share * budget / totals(s))
    }
    stratifiedSample(df, keyCol, stratumCol, rates, defaultRate = 0.0, salt)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006 A-Res): each row draws its uniform u from the md5
    * of (key || salt) and ranks by `u^(1/w)` — taking the top-k gives
    * every row inclusion odds proportional to its weight, with the
    * classic reservoir guarantee. Ranking happens on
    * `score = ln(u)/w` (monotone in u^(1/w)), rounded 6dp so the
    * cut is engine-stable; ties break on the key.
    *
    * Scale shape: map-only scoring (no shuffle — the hash IS the
    * randomness, so no seed exchange either) + one TakeOrdered top-k.
    * Rows with non-positive weight are excluded. Same key + salt =>
    * same sample on every engine, partitioning, and rerun. */
  /** Temperature-scaled token mixture — the multilingual-LM sampling
    * rule (multilingual BERT / XLM-R style): target token share of
    * stratum s is proportional to `tokens_s^alpha`, so `alpha = 1`
    * reproduces the natural distribution and `alpha < 1` flattens it,
    * upsampling low-resource strata RELATIVE to their mass (here by
    * downsampling the rich strata — a keep-rate sampler never
    * duplicates rows, so the scarcest stratum anchors the budget like
    * [[tokenBudgetMix]]).
    *
    * The normalization constant cancels: with `w_s = tokens_s^alpha`,
    * budget `B = min_u tokens_u / w_u` and keep rate
    * `r_s = w_s * B / tokens_s = (minTok / tokens_s)^(1 - alpha)`
    * (for alpha in [0, 1]; minTok = the smallest stratum's tokens).
    * That closed form avoids a summation whose ORDER would perturb the
    * md5 thresholds cross-engine; at `alpha = 0.5` both engines compute
    * it with one correctly-rounded IEEE sqrt of the same quotient, so
    * the sampled set is bit-reproducible. `alpha = 0` equalizes token
    * budgets across strata. Map-only after one token-totals pass. */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
      nTokensCol: String, alpha: Double, salt: String = ""): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val totals = df
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(sum(col(nTokensCol).cast("decimal(38,6)")).as("tok"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) 0.0 else r.getDecimal(1).doubleValue())).toMap
    require(totals.nonEmpty, "no strata")
    val empty = totals.collect { case (s, t) if t <= 0 => s }
    require(empty.isEmpty,
      s"strata with zero tokens: ${empty.mkString(",")}")
    val minTok = totals.values.min
    val rates = totals.map { case (s, tok) =>
      s -> (if (alpha == 1.0) 1.0
        else if (alpha == 0.5) math.min(1.0, math.sqrt(minTok / tok))
        else math.min(1.0, math.pow(minTok / tok, 1.0 - alpha)))
    }
    stratifiedSample(df, keyCol, stratumCol, rates, defaultRate = 0.0, salt)
  }

  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // the SAME 8-hex-char hash every sampler here uses — one
    // parity-critical definition, not a second copy
    val u = (conv(bucket(col(keyCol), salt), 16, 10).cast("double") + 1.0) /
      4294967296.0
    df.filter(col(weightCol) > 0)
      .withColumn("score", round(log(u) / col(weightCol), 6))
      .orderBy(col("score").desc, col(keyCol))
      .limit(k)
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by `log w(d) = sum over tokens of
    * ln p_target(b) - ln p_raw(b)`, where `b` is the token's hashed
    * feature bucket and the two bucket models are add-alpha-smoothed
    * unigram distributions of the target (reference) corpus and the
    * raw corpus being scored. Resample by `exp(logw)` (or keep the
    * top quantile) to shift the raw corpus toward the target domain.
    *
    * Buckets come from the first 4 hex chars of md5(token) mod
    * `nBuckets` — deterministic and replayable on any SQL engine.
    *
    * Scale shape: both models are ONE aggregation each, completed over
    * the full bucket domain (spark.range) so absent buckets smooth to
    * alpha rather than vanish; the per-bucket log-ratio table is
    * `nBuckets` rows and BROADCAST to the token stream; the per-doc
    * reduction sums 8dp-rounded terms as exact decimals, so the total
    * is independent of partitioning and engine. No driver loops.
    */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 1024,
      alpha: Double = 0.5): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536,
      s"need 2 <= nBuckets <= 65536: $nBuckets")
    require(alpha > 0, s"alpha must be positive: $alpha")
    import graft.functions.TextFunctions.tokens
    val spark = raw.sparkSession
    def bucketOf(tok: Column): Column =
      pmod(conv(substring(md5(tok), 1, 4), 16, 10).cast("long"),
        lit(nBuckets.toLong))
    // the raw side is tokenized + hashed ONCE: the cached (doc, bucket)
    // stream feeds both the raw model counts and the final scoring join
    // (without the cache the dominant per-token md5 work runs twice)
    val rawBuckets = graft.operators.TrackedCaches.persist(
      raw.select(col(idCol).as("doc_id"),
          explode(tokens(col(textCol))).as("tok"))
        .select(col("doc_id"), bucketOf(col("tok")).as("b")))
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(explode(tokens(col(textCol))).as("tok"))
        .groupBy(bucketOf(col("tok")).as("b"))
        .agg(count(lit(1)).as("c"))
    val tC = bucketCounts(target).withColumnRenamed("c", "ct")
    val rC = rawBuckets.groupBy("b").agg(count(lit(1)).as("cr"))
    val nT = broadcast(tC.agg(sum("ct").as("n_t")))
    val nR = broadcast(rC.agg(sum("cr").as("n_r")))
    val dom = spark.range(nBuckets).select(col("id").as("b"))
    def smoothed(c: Column, n: Column): Column =
      (c.cast("double") + alpha) / (n.cast("double") + alpha * nBuckets)
    val model = broadcast(dom
      .join(tC, Seq("b"), "left").join(rC, Seq("b"), "left")
      .crossJoin(nT).crossJoin(nR)
      .select(col("b"),
        round(log(smoothed(coalesce(col("ct"), lit(0L)), col("n_t"))) -
          log(smoothed(coalesce(col("cr"), lit(0L)), col("n_r"))), 8)
          .as("term")))
    rawBuckets
      .join(model, "b")
      .groupBy("doc_id")
      .agg(sum(col("term").cast("decimal(20,8)")).cast("double")
        .as("logw"))
  }

  /** Domain balancing: keep at most `maxPer` rows per group, preferring
    * high `orderCol` (ties broken by `idCol` asc, so the kept set is
    * deterministic) — the C4/CCNet-style per-domain cap that stops a
    * crawl's megadomains from dominating the mixture.
    *
    * Scale shape: written as a rank filter on a grouped window, which
    * Spark 3.5+ rewrites to WindowGroupLimit — each map task pre-trims
    * its partition to the top `maxPer` per group BEFORE the exchange,
    * so a hot domain ships maxPer rows per mapper, not its whole
    * corpus slice, and the single shuffle is the only data movement
    * (asserted in PlanSpec). */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, maxPer: Int): DataFrame = {
    require(maxPer >= 1, s"maxPer must be >= 1: $maxPer")
    val w = Window.partitionBy(groupCol)
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPer)
      .drop("__rn")
  }

  /** Systematic token-budget sampling: one document per `stride` tokens
    * of the (hash-shuffled) global order — the evenly-spaced eval/audit
    * draw that per-doc Bernoulli sampling can't give (Bernoulli spacing
    * is geometric: it clumps and gaps, and its TOKEN coverage varies
    * with doc length; systematic spacing is the survey-sampling fix).
    * A document is selected iff its token span
    * [cum_before, cum_before + tokens) contains a multiple of `stride`,
    * so every stride-window of the token stream contributes exactly one
    * document (a doc longer than `stride` is still selected once).
    *
    * Deterministic: the order is (md5(id || '#' || salt), id) — the
    * engine's standard sharded global order, no single-reducer sort —
    * and the whole selection replays in SQL as a window sum. */
  def systematicTokenSample(df: DataFrame, idCol: String,
      tokenCol: String, stride: Long,
      salt: String = "order"): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    GlobalOrder.globalPrefixSum(df.select(col(idCol), col(tokenCol)),
        idCol, tokenCol, salt = salt, keepValue = true)
      .filter(col(tokenCol) > 0 &&
        floor((col("cum_before") + col(tokenCol) - 1) / stride) * stride
          >= col("cum_before"))
      .select(col(idCol), col("global_pos"), col("cum_before"),
        col(tokenCol))
  }

  /** 2-D Pareto frontier per group — quality-vs-cost curation under a
    * token budget: a row survives iff no other row in its group costs
    * at most as much AND gains at least as much with one inequality
    * strict (identical points both survive — neither strictly
    * dominates). NOT the naive quadratic dominance join: collapse to
    * the DISTINCT-COST frame (per-cost max gain), take the
    * strictly-cheaper cummax with a ROWS frame over that frame — rows
    * offsets on distinct costs mean "previous distinct cost", exact
    * for ANY numeric cost, where a RANGE -1 offset would silently
    * skip costs less than one unit apart — and join the two maxima
    * back:
    * `dominated <=> max(gain | cost' < cost) >= gain
    *            OR max(gain | cost' = cost) > gain`.
    * One aggregate + one (group, cost)-key join + one group-key sort —
    * linear at any scale. Output: the surviving input rows. */
  def paretoFrontier2D(df: DataFrame, groupCol: String, costCol: String,
      gainCol: String): DataFrame = {
    val in = df.filter(col(costCol).isNotNull && col(gainCol).isNotNull)
    val perCost = in
      .groupBy(col(groupCol).as("__pg"), col(costCol).as("__pc"))
      .agg(max(col(gainCol).cast("double")).as("__msame"))
      .withColumn("__mprev", max("__msame").over(
        Window.partitionBy("__pg").orderBy("__pc")
          .rowsBetween(Window.unboundedPreceding, -1)))
    in.join(perCost,
        col(groupCol) === col("__pg") && col(costCol) === col("__pc"))
      .filter(
        (col("__mprev").isNull ||
          col("__mprev") < col(gainCol).cast("double")) &&
        col("__msame") === col(gainCol).cast("double"))
      .drop("__pg", "__pc", "__mprev", "__msame")
  }

  /** Temperature-smoothed domain-mixture reweighting (the DoReMi /
    * multilingual-sampling α=0.5 recipe): per group, the natural token
    * share `p = t/T` and the smoothed target share
    * `q = √t / Σ_g √t_g` (α = 0.5, so `t^α` is an exact `sqrt`), plus
    * the per-group sampling weight `q/p` — upweight the tail, damp the
    * head. The Σ√t denominator is a groups-sized sorted-fold (the
    * kmeans/lloyd exactness recipe), never a shuffle-order float sum.
    * Output: `(group, n_tokens, natural_share, target_share, weight)`.
    * Scale shape: one hash aggregate to the groups frame (integral
    * token sums), one broadcast one-row totals join. */
  /** word2vec-style negative-sampling distribution over the top-`v`
    * vocabulary: `p(tok) = c^0.75 / Σ c^0.75` (Mikolov et al. 2013 —
    * the unigram-to-the-3/4 damping that upweights the tail). The
    * vocabulary is bounded to `v` tokens by (count desc, token asc —
    * deterministic ties) BEFORE any float math, so the Σ denominator
    * is a v-sized sorted fold, and driver/oracle memory is v-bounded
    * at any corpus size. Output: `(token, c, p)`. */
  def negSamplingDist(df: DataFrame, textCol: String, v: Int)
      : DataFrame = {
    require(v >= 1 && v <= 1000000, s"bad v: $v")
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(graft.functions.TextFunctions.tokens(
        col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
    // TakeOrdered (orderBy+limit), never an unpartitioned rank window
    // — the vocab frame is itself corpus-scale on a 100 TB crawl
    val top = counts.orderBy(col("c").desc, col("token")).limit(v)
    val denom = top.agg(
      aggregate(sort_array(collect_list(pow(col("c"), 0.75))),
        lit(0.0), (acc, x) => acc + x).as("__s"))
    top.crossJoin(broadcast(denom))
      .select(col("token"), col("c"),
        round(pow(col("c"), 0.75) / col("__s"), 6).as("p"))
  }

  def domainMixture(df: DataFrame, groupCol: String, tokenCol: String)
      : DataFrame = {
    val grouped = df
      .filter(col(groupCol).isNotNull && col(tokenCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
    val totals = grouped.agg(sum("__t").as("__tt"),
      aggregate(sort_array(collect_list(sqrt(col("__t")))), lit(0.0),
        (acc, x) => acc + x).as("__st"))
    grouped.crossJoin(broadcast(totals))
      .withColumn("__p", col("__t") / col("__tt").cast("double"))
      .withColumn("__q", sqrt(col("__t")) / col("__st"))
      .select(col("__g").as(groupCol), col("__t").as("n_tokens"),
        round(col("__p"), 6).as("natural_share"),
        round(col("__q"), 6).as("target_share"),
        round(col("__q") / col("__p"), 6).as("weight"))
  }

  /** Neyman (optimal) allocation for stratified sampling — the
    * variance-minimizing split of a fixed labeling/eval budget across
    * strata (Neyman 1934; the standard refinement of proportional
    * allocation): `n_h ∝ N_h * s_h`, so big AND noisy strata get more
    * of the budget. The per-stratum standard deviation comes from the
    * data itself: values are rounded to 6dp and summed as
    * DECIMAL(18,6) / DECIMAL(38,12) (exact moments — no cross-row
    * float accumulation); sd and the shares are single-expression
    * doubles off those exact sums. `n_alloc` is the share of
    * `totalN`, rounded half-up deterministically.
    *
    * ONE hash aggregate over the corpus; everything after lives on
    * the strata-sized frame (the final share normalization is a
    * window over that bounded frame, not the data). */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      valCol: String, totalN: Long): DataFrame = {
    require(totalN >= 1, s"bad totalN: $totalN")
    val x = round(col(valCol).cast("double"), 6).cast("decimal(18,6)")
    val agg = df.select(col(stratumCol).as("stratum"), x.as("__x"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"), sum("__x").as("__s"),
        sum(col("__x") * col("__x")).as("__q"))
      .filter(col("n") >= 2) // a 1-row stratum has no variance signal
    val sd = sqrt((col("__q").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / col("n"))
      / (col("n") - 1))
    val w = agg.withColumn("__w", col("n") * sd)
      .withColumn("__tot", sum("__w").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    w.select(col("stratum"), col("n"), round(sd, 6).as("sd"),
      round(col("__w") / col("__tot"), 6).as("alloc_share"),
      floor(lit(totalN.toDouble) * col("__w") / col("__tot") + 0.5)
        .cast("long").as("n_alloc"))
  }

  /** Mixture-KL audit — did the SHIPPED training mix match the
    * designed one: KL(realized || target) over token shares, plus the
    * worst absolute share gap. The realized shares are integral token
    * ratios; every observed stratum MUST appear in the target list
    * (witness-probed) so a silently-missing stratum cannot read as
    * divergence zero. ONE corpus aggregate to the strata frame; the
    * <= |target| KL terms fold in stratum order (sorted fold). */
  def mixtureKl(df: DataFrame, stratumCol: String, tokenCol: String,
      target: Seq[(String, Double)]): DataFrame = {
    require(target.nonEmpty &&
      math.abs(target.map(_._2).sum - 1.0) < 1e-9 &&
      target.forall(_._2 > 0),
      "target must cover the mix with positive weights summing to 1")
    val spark = df.sparkSession
    val t = spark.createDataFrame(target).toDF("stratum", "q")
    val shares = df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(col(tokenCol).cast("long")).as("toks"))
    val missing = shares.join(broadcast(t), Seq("stratum"), "left_anti")
      .limit(1).collect()
    require(missing.isEmpty,
      s"mixtureKl: observed stratum ${missing.headOption.map(_.get(0))} " +
        "is not in the target mix — add it (KL against a zero target " +
        "weight is infinite, not zero)")
    val joined = shares.join(broadcast(t), Seq("stratum"))
      .crossJoin(broadcast(shares.agg(
        sum("toks").cast("long").as("__tt"))))
      .withColumn("__p", col("toks").cast("double") / col("__tt"))
      .withColumn("__term",
        when(col("__p") > 0, col("__p") * log(col("__p") / col("q")))
          .otherwise(0.0))
    joined.agg(count(lit(1)).as("n_strata"),
        max("__tt").as("total_tokens"),
        aggregate(sort_array(collect_list(
          struct(col("stratum"), col("__term").as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("__kl"),
        max(abs(col("__p") - col("q"))).as("__gap"))
      .select(col("n_strata"), col("total_tokens"),
        round(col("__kl"), 6).as("kl"),
        round(col("__gap"), 6).as("max_abs_gap"))
  }

  /** Epoch-repetition plan per source (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": up to ~4 epochs of
    * repeated data behave near-fresh): given a total token budget
    * split by uniform target share, each source's quota over its mass
    * gives the epoch count, capped at `maxEpochs` — the planner's
    * readout of which sources will repeat and which leave budget
    * unused. One hash aggregate to the sources frame; integral
    * masses, two rounded divisions. */
  def epochPlan(df: DataFrame, sourceCol: String, tokenCol: String,
      totalBudget: Long, maxEpochs: Double = 4.0): DataFrame = {
    require(totalBudget > 0 && maxEpochs >= 1.0,
      s"bad budget=$totalBudget maxEpochs=$maxEpochs")
    val mass = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol).cast("long")).as("mass"))
    val nSrc = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    mass
      .withColumn("__k", count(lit(1)).over(nSrc))
      .withColumn("quota",
        round(lit(totalBudget.toDouble) / col("__k"), 6))
      .withColumn("epochs",
        round(least(lit(maxEpochs),
          col("quota") / col("mass")), 6))
      .withColumn("planned_tokens",
        round(col("mass") * col("epochs"), 2))
      .select("source", "mass", "quota", "epochs", "planned_tokens")
  }
}
