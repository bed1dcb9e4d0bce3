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
}
