package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** One block of vectors, materialized as primitive arrays so the
  * all-pairs loop in [[Similarity.cosineNearDupPairs]] runs on flat
  * doubles (no per-pair Catalyst HOF eval). Public: Spark's encoder
  * codegen must construct/inspect it from generated classes. */
final case class VecBlock(
    blk: Int, ids: Array[Long], vecs: Array[Array[Double]],
    nrms: Array[Double])

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, one broadcast join of the
  * (small) query set against the corpus, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing — candidates share a
  * signed-projection bucket, so the quadratic cross product never forms;
  * recall is tunable via number of planes / probed buckets.
  *
  * All arithmetic is double-precision higher-order-function pipelines
  * (zip_with + aggregate) — JVM-native, no Python/scala UDF serialization.
  */
object Similarity {

  /** Sequential-fold double dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — bit-identical to the HOF
    * formulation `dot(a,b)/(norm(a)*norm(b))` but a single fused
    * primitive loop instead of per-element lambda evaluation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); the corpus is scanned
    * once with no shuffle beyond the final per-query top-k. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = c.join(q, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "cos")
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup).
    * Exact O(n^2) arithmetic, organized as a triangular block-pair join:
    * vectors hash into `nBlocks` blocks, the (nBlocks choose 2)+nBlocks
    * block pairs fan out across executors, and each task runs a tight
    * primitive dot-product loop over its two blocks. Total shuffle is
    * O(n * nBlocks) vector copies (each block meets every other block),
    * the classic all-pairs triangle: pick nBlocks ~ sqrt(#tasks wanted).
    * Per-element arithmetic is float->double cast then sequential double
    * accumulation — bit-identical to the DuckDB oracle's
    * list_dot_product. Use LSH banding instead when n^2 itself is the
    * problem. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nBlocks: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blocks = df
      .select(pmod(hash(col(idCol)), lit(nBlocks)).as("blk"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Int, Long, Array[Double])]
      .groupByKey(_._1)
      .mapGroups { (blk, it) =>
        val rows = it.toArray
        VecBlock(blk, rows.map(_._2), rows.map(_._3),
          rows.map(r => math.sqrt(dotD(r._3, r._3))))
      }
    val a = blocks.alias("a")
    val b = blocks.alias("b")
    a.joinWith(b, col("a.blk") <= col("b.blk"))
      .flatMap { case (ba, bb) =>
        val same = ba.blk == bb.blk
        val out = Vector.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < ba.ids.length) {
          var j = if (same) i + 1 else 0
          while (j < bb.ids.length) {
            val c = dotD(ba.vecs(i), bb.vecs(j)) / (ba.nrms(i) * bb.nrms(j))
            // cheap pre-filter; exact decimal HALF_UP (= Spark/DuckDB
            // ROUND semantics) only for survivors near/above threshold
            if (c >= threshold - 1e-9) {
              val r = BigDecimal(c)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (r >= threshold) {
                val (x, y) = (ba.ids(i), bb.ids(j))
                out += (if (x < y) (x, y, r) else (y, x, r))
              }
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("id_a", "id_b", "cos")
  }

  /** Sequential double dot product (matches SQL engines' fold order). */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nLists` cells; each query probes only
    * its `nProbe` nearest cells, so scored candidates shrink by
    * ~nProbe/nLists while recall stays high for clustered data. The
    * centroid table is tiny (nLists x dim) and rides to the driver;
    * the corpus is assigned distributed by the model and joined by
    * list id — the standard FAISS-style IVF layout expressed as an
    * equi-join. Queries must be small (collected for probe
    * assignment, same contract as bruteForceTopK's broadcast).
    *
    * `trainFraction` < 1 fits the coarse quantizer on a seeded sample —
    * the scale path: k-means needs only enough points to place nLists
    * centroids (FAISS trains on ~39*nLists..256*nLists points), so at
    * 100 TB the fit must NOT iterate over the full corpus. Assignment
    * stays exact over all rows regardless. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1]: $trainFraction")

    val feats = corpus.select(col(idCol).as("cid"),
      col(vecCol).as("cv"),
      array_to_vector(col(vecCol).cast("array<double>")).as("fv"))
    val trainSet =
      if (trainFraction >= 1.0) feats
      else feats.sample(withReplacement = false, trainFraction, seed)
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list")
      .fit(trainSet)
    val assigned = model.transform(feats).select("cid", "cv", "list")

    val centers = model.clusterCenters.map(_.toArray)
    val probes = queries.select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .collect()
      .flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Double](1).toArray
        centers.indices
          .sortBy { c =>
            var s = 0.0; var j = 0
            val cv = centers(c)
            while (j < qv.length) {
              val dd = qv(j) - cv(j); s += dd * dd; j += 1
            }
            s
          }
          .take(nProbe)
          .map(list => (qid, qv.map(_.toFloat), list))
      }.toSeq.toDF("qid", "qv", "list")

    assigned.join(broadcast(probes), "list")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)
      .select("qid", "cid", "cos")
  }

  /** Deterministic random hyperplanes (seeded driver-side, inlined as
    * plan literals — tiny: nPlanes x dim doubles). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Signed-random-projection bucket id for each vector: bit j = sign of
    * <v, plane_j>. Shuffle-free projection; same seed => same buckets. */
  def lshBucket(vecCol: Column, nPlanes: Int, dim: Int, seed: Long): Column =
    planes(nPlanes, dim, seed).zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(vecCol, array(p.map(lit): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: exact cosine ranking within LSH buckets. Each
    * vector is compared only to same-bucket vectors — at scale this is
    * the difference between a cross join and an equi-join. Recall loses
    * only cross-bucket neighbors; raise recall by lowering nPlanes or
    * multi-probing (union of several seeds). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucket = lshBucket(col("v"), nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("v"))
      .withColumn("bkt", bucket).withColumnRenamed("v", "cv")
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("v"))
      .withColumn("bkt", bucket).withColumnRenamed("v", "qv"))
    val cA = c.as("c")
    val qA = q.as("q")
    cA.join(qA,
        col("q.qid") =!= col("c.cid") && col("q.bkt") === col("c.bkt"))
      .select(col("q.qid").as("qid"), col("c.cid").as("cid"),
        round(cosine(col("q.qv"), col("c.cv")), 6).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)
      .select("qid", "cid", "cos")
  }
}
