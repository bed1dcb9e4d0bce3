package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    * Exact O(n^2) — the oracle-checkable baseline; use `lshTopK` or
    * `minhash`-style banding at scale. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
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
