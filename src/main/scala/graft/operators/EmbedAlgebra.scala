package graft.operators

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed linear algebra over an embedding column — the
  * PCA/whitening toolkit a SemDeDup-style semantic-dedup or
  * embedding-drift monitor runs before clustering.
  *
  * Scale shape: every operator here reduces the corpus to
  * dimension-bounded state (dim^2 Gram entries, dim means) with
  * map-side partial aggregation, or is a pure map-only projection.
  * Corpus size appears in exactly one scan; nothing row-sized ever
  * shuffles or reaches the driver.
  *
  *  - [[gram]]: X'X upper triangle. The pair generation is ROW-LOCAL
  *    (chained posexplode over the row's own array — no self-join, no
  *    shuffle of exploded rows); hash-agg partials collapse each
  *    partition to <= dim*(dim+1)/2 rows before the single dim^2-sized
  *    shuffle. The 64x64 multiply-adds per row are the irreducible
  *    FLOP cost of a Gram matrix. Oracle-exact (DuckDB replays with
  *    two `range` laterals).
  *  - [[pca]]: covariance eigendecomposition. One corpus pass builds
  *    (n, sum, gram) — K-sized — then Breeze `eigSym` runs on the
  *    driver's dim x dim matrix (64x64 here; eigen work is O(dim^3),
  *    corpus-independent, exactly where it belongs). Sign-fixed
  *    (largest-|loading| component positive) so output is
  *    deterministic; spec-pinned (eigen is not ANSI-expressible), with
  *    the input covariance oracle-pinned via [[gram]].
  *  - [[randomProject]]: Johnson-Lindenstrauss Rademacher projection
  *    to k dims. Signs come from md5("rp|i|j") parity — the same
  *    md5-keyed derandomization the bootstrap oracles use — so DuckDB
  *    rebuilds the identical +-1 matrix and the query is oracle-EXACT
  *    despite being "random". Map-only, no shuffle.
  */
object EmbedAlgebra {

  /** Upper-triangle Gram matrix: (i, j, g) with i <= j,
    * g = round(sum_rows x_i * x_j, dp). */
  def gram(df: DataFrame, vecCol: String = "embedding", dp: Int = 4)
      : DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("i", "xi")),
        col(vecCol).as("v"))
      .select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(col("v")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(round(sum(col("xi") * col("xj").cast("double")), dp).as("g"))

  /** Top-k principal components of the population covariance, long
    * form: (component, eigenvalue, evr, pos, loading). Loadings 6dp,
    * eigenvalues 6dp; component 0 has the largest eigenvalue. */
  def pca(df: DataFrame, k: Int, vecCol: String = "embedding")
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE pass: count, per-position sums, full-triangle gram — all
    // dimension-bounded. Reuses the row-local gram explosion.
    val base = df.select(col(vecCol).as("v")).where(col("v").isNotNull)
    val nRow = base.count()
    require(nRow > 0, "pca needs a non-empty corpus")
    val sums = base
      .select(posexplode(col("v")).as(Seq("i", "xi")))
      .groupBy("i").agg(sum(col("xi").cast("double")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dim = sums.size
    val g = gram(base, "v", dp = 12).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val cov = DenseMatrix.tabulate(dim, dim) { (a, b) =>
      val (i, j) = if (a <= b) (a, b) else (b, a)
      g((i, j)) / nRow - (sums(a) / nRow) * (sums(b) / nRow)
    }
    val es = eigSym(cov)
    val total = breeze.linalg.sum(es.eigenvalues)
    val order = es.eigenvalues.toArray.zipWithIndex
      .sortBy { case (ev, idx) => (-ev, idx) }.take(k)
    val rows = order.zipWithIndex.flatMap { case ((ev, idx), comp) =>
      val raw = es.eigenvectors(::, idx)
      // deterministic sign: the largest-|loading| entry is positive
      // (ties by lowest position)
      val pivot = (0 until dim)
        .maxBy(p => (math.abs(raw(p)), -p))
      val vec: DenseVector[Double] =
        if (raw(pivot) < 0) raw * -1.0 else raw * 1.0
      (0 until dim).map { pos =>
        (comp, BigDecimal(ev).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
          BigDecimal(ev / total).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          pos,
          BigDecimal(vec(pos)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    spark.createDataset(rows.toIndexedSeq)
      .toDF("component", "eigenvalue", "evr", "pos", "loading")
  }

  /** +-1 sign for projection cell (i, j): parity of the first hex
    * digit of md5("rp|i|j") — replayable as SQL md5 on any engine. */
  def rpSign(i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp|$i|$j".getBytes("UTF-8"))
    val firstHex = (d(0) >> 4) & 0xf
    if (firstHex % 2 == 0) 1.0 else -1.0
  }

  /** JL Rademacher projection to k dims, long form (id, j, val 6dp);
    * val_j = sum_i x_i * sign(i, j) / sqrt(k). Map-only. */
  def randomProject(df: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val scale = math.sqrt(k.toDouble)
    val outs = (0 until k).map { j =>
      val signs = array((0 until dim).map(i => lit(rpSign(i, j))): _*)
      round(aggregate(
        zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, t) => acc + t) / scale, 6)
    }
    df.select(col(idCol), posexplode(array(outs: _*)).as(Seq("j", "val")))
  }

  /** PMI-SVD word embeddings — the count-based formulation (factorize
    * the positive-PMI co-occurrence matrix; Levy & Goldberg 2014 show
    * this approximates skip-gram with negative sampling) recast
    * Spark-first:
    *
    *  1. windowed co-occurrence pairs are generated ARRAY-LOCALLY per
    *     document (`zip_with` of the token array against its own
    *     ±1..window shifts — no self-join, no position explode);
    *  2. one symmetric hash aggregate gives the (vocab x vocab)-sparse
    *     count matrix and the row marginals — corpus-sized work ends
    *     here;
    *  3. PPMI + `eigSym` run driver-side on the vocab-bounded matrix —
    *     bounded by construction: `minCount` plus a deterministic
    *     top-`maxVocab` frequency cutoff (the word2vec max_vocab
    *     contract) prune the tail before any pair aggregate; embedding
    *     = top-`dim` eigenvectors scaled by sqrt(eigenvalue), with the
    *     PCA sign convention for determinism.
    *
    * Long-form output (tok, comp, value 6dp). Rows-only as a driver
    * query BY DESIGN (eigen is not ANSI SQL); the PMI inputs are
    * cross-engine-pinned through `q_token_pmi`, and WordVectorsSpec
    * pins topic-cluster geometry + determinism. */
  def wordVectors(docs: DataFrame, textCol: String, window: Int = 2,
      dim: Int = 16, maxVocab: Int = 2048,
      minCount: Long = 0L): DataFrame = {
    require(window >= 1, s"bad window: $window")
    require(dim >= 1, s"bad dim: $dim")
    // DRIVER-MEMORY CONTRACT: the ordered co-occurrence pair set (up to
    // maxVocab^2 tuples), the dense maxVocab x maxVocab PPMI matrix,
    // and an O(maxVocab^3) eigSym all live on the driver — that is the
    // count-based factorization's nature, not an accident. The default
    // (2048, the original contract -> ~4M pairs, ~32 MB matrix,
    // seconds-scale eig) stays; the hard cap below stops a parameter from
    // silently inviting a multi-GB collect + minutes-long eig (4096^2
    // pairs ~ 1.3 GB of boxed tuples). Callers needing a larger
    // vocabulary should train in shards or use the hashed features
    // path (TextQuality.featureHash).
    require(maxVocab >= 1 && maxVocab <= 4096,
      s"maxVocab=$maxVocab outside [1, 4096]: the PPMI factorization " +
        "is driver-side with maxVocab^2 pair memory and maxVocab^3 eig " +
        "cost; shard the corpus or use feature hashing beyond 4096")
    val spark = docs.sparkSession
    import spark.implicits._
    // toks feeds BOTH the vocab-count pass and the pair explode: one
    // tokenization, cached (Spark has no cross-branch CSE)
    val toks = TrackedCaches.persist(docs
      .select(graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0))
    val rawPairs = toks.select(explode(flatten(
        transform(sequence(lit(1), lit(window)), j =>
          zip_with(
            slice(col("t"), lit(1), greatest(size(col("t")) - j, lit(0))),
            slice(col("t"), j + 1, size(col("t"))),
            (a, b) => struct(a.as("wa"), b.as("wb"))))))
        .as("pr"))
      .select(col("pr.wa").as("wa"), col("pr.wb").as("wb"))
      .where(length(col("wa")) > 0 && length(col("wb")) > 0)
    // word2vec-style vocabulary pruning: drop tokens under `minCount`,
    // then keep the top `maxVocab` by (frequency DESC, token ASC) —
    // deterministic — and cut the long tail BEFORE the pair aggregate
    // via broadcast semi-joins. This is the step that makes an
    // open-vocabulary corpus fit the driver-side factorization; it
    // never throws, it prunes (the word2vec max_vocab contract).
    val keep = toks.select(explode(col("t")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= math.max(minCount, 1L))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .select("w")
    val pairs = rawPairs
      .join(broadcast(keep).withColumnRenamed("w", "wa"), Seq("wa"),
        "left_semi")
      .join(broadcast(keep).withColumnRenamed("w", "wb"), Seq("wb"),
        "left_semi")
    // ONE corpus-sized aggregate over the ORDERED pairs; the symmetric
    // closure is a vocab^2-bounded driver fold (a unionByName of the
    // swapped frame would re-execute the whole pair explode + semi-joins
    // for the second branch)
    val ordered = pairs.groupBy("wa", "wb").agg(count(lit(1)).as("cab"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    toks.unpersist()
    val cAB = (ordered ++ ordered.map { case ((a, b), c) => ((b, a), c) })
      .groupMapReduce(_._1)(_._2)(_ + _)
    val cA = cAB.groupMapReduce(_._1._1)(_._2)(_ + _)
    val vocab = cA.keys.toArray.sorted
    if (vocab.isEmpty) {
      // no co-occurrence at all (every doc a single token, or pruning
      // removed everything): an empty result frame, not a 0x0 eigSym
      return spark.createDataset(Seq.empty[(String, Int, Double)])
        .toDF("tok", "comp", "value")
    }
    val total = cAB.valuesIterator.sum.toDouble
    val n = vocab.length
    val ppmi = DenseMatrix.tabulate(n, n) { (a, b) =>
      cAB.get((vocab(a), vocab(b))).fold(0.0) { c =>
        math.max(0.0,
          math.log(c * total / (cA(vocab(a)).toDouble * cA(vocab(b)))))
      }
    }
    val es = eigSym(ppmi)
    val order = es.eigenvalues.toArray.zipWithIndex
      .sortBy { case (ev, i) => (-ev, i) }.take(math.min(dim, n))
    val rows = for {
      ((ev, evIdx), comp) <- order.zipWithIndex
      raw = es.eigenvectors(::, evIdx)
      pivot = (0 until n).maxBy(p => (math.abs(raw(p)), -p))
      sgn = if (raw(pivot) < 0) -1.0 else 1.0
      scale = math.sqrt(math.max(ev, 0.0))
      w <- 0 until n
    } yield (vocab(w), comp,
      BigDecimal(sgn * raw(w) * scale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    spark.createDataset(rows.toIndexedSeq).toDF("tok", "comp", "value")
  }

  /** Embedding centroid drift per label between two id-hash slices —
    * the representation-stability monitor run between snapshot builds
    * ("did this class's embedding cloud move?"). Slice `id % 2` plays
    * the old/new snapshot split; per (label, slice) centroids come
    * from one chained-posexplode aggregate (dimension-bounded, no
    * self-join, the [[gram]] shape), are ROUNDED 6dp — so both engines
    * hold bit-identical centroid vectors before any cross-term — and
    * compared by cosine. Output per label: slice sizes, cosine, and
    * `drift = 1 − cosine` (6dp). */
  def centroidDrift(df: DataFrame, labelCol: String, idCol: String,
      vecCol: String = "embedding"): DataFrame = {
    val e = df.select(col(labelCol).as("lbl"),
        (col(idCol) % 2).cast("int").as("s"),
        posexplode(col(vecCol)).as(Seq("i", "x")))
    val cent = e.groupBy("lbl", "s", "i")
      .agg(round(avg(col("x").cast("double")), 6).as("c"),
        count(lit(1)).as("cnt"))
    val piv = cent.groupBy("lbl", "i")
      .agg(sum(when(col("s") === 0, col("c"))).as("c0"),
        sum(when(col("s") === 1, col("c"))).as("c1"),
        max(when(col("s") === 0, col("cnt"))).as("n0"),
        max(when(col("s") === 1, col("cnt"))).as("n1"))
    piv.groupBy(col("lbl").as(labelCol))
      .agg(max("n0").as("n0"), max("n1").as("n1"),
        sum(col("c0") * col("c1")).as("__dot"),
        sum(col("c0") * col("c0")).as("__n0sq"),
        sum(col("c1") * col("c1")).as("__n1sq"))
      .withColumn("cosine",
        when(col("__n0sq") > 0 && col("__n1sq") > 0,
          round(col("__dot") /
            (sqrt(col("__n0sq")) * sqrt(col("__n1sq"))), 6)))
      .withColumn("drift", round(lit(1.0) - col("cosine"), 6))
      .select(col(labelCol), col("n0"), col("n1"), col("cosine"),
        col("drift"))
  }
}
