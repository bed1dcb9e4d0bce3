package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators for vector corpora at scale: L2
  * normalization and symmetric int8 quantization (the standard
  * 4x-storage-shrink for ANN indexes; FAISS's SQ8 layout).
  *
  * Everything is per-row arithmetic over `functions._` HOFs — no UDFs,
  * no shuffle; these are map-only projections that scan-pushdown and
  * pipeline with whatever comes next. Float inputs are widened to
  * double before arithmetic so results are engine-reproducible (the
  * DuckDB oracle computes over the same widened values). */
object Embeddings {

  private def toD(v: Column): Column = transform(v, _.cast("double"))

  /** L2 norm of an embedding column. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(toD(v), lit(0.0), (acc, x) => acc + x * x))

  /** Unit-normalized copy of the vector (zero vectors pass through). */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n > 0.0, transform(toD(v), x => x / n)).otherwise(toD(v))
  }

  /** Per-vector symmetric int8 scale: max|x| / 127. */
  def int8Scale(v: Column): Column =
    aggregate(toD(v), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0

  /** Symmetric int8 quantization: q_i = round(x_i / scale), in
    * [-127, 127]. Returned as int (parquet/oracle-friendly); cast to
    * byte at the storage boundary for the 4x shrink. */
  def quantizeInt8(v: Column): Column = {
    val s = int8Scale(v)
    when(s > 0.0,
      transform(toD(v), x => round(x / s, 0).cast("int")))
      .otherwise(transform(toD(v), x => lit(0)))
  }

  /** Reconstruction q_i * scale of a quantized vector. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Per-group embedding centroids in LONG FORM (group, pos,
    * centroid_val) — class/source centroids for clustering diagnostics
    * and IVF warm starts. posexplode -> one hash-agg keyed by
    * (group, pos): the shuffle carries groups x dim doubles with full
    * map-side partial aggregation, never whole vectors; long-form output
    * avoids float-array equality pitfalls in downstream sinks. */
  def groupCentroids(df: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(toD(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(round(avg("x"), 6).as("centroid_val"))

  /** Scalar quantization digest per vector: the norm, the scale, the
    * quantized-component sum, and the reconstruction MSE — the values a
    * quality gate monitors, and all ANSI-expressible for the oracle
    * (`q_embed_quant`). */
  def quantDigest(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val s = int8Scale(v)
    val deq = dequantizeInt8(quantizeInt8(v), s)
    val err = zip_with(toD(v), deq, (x, d) => (x - d) * (x - d))
    df.select(col(idCol),
      round(l2Norm(v), 6).as("norm"),
      round(s, 9).as("scale"),
      aggregate(quantizeInt8(v), lit(0L), (acc, q) => acc + q).as("q_sum"),
      round(aggregate(err, lit(0.0), (acc, e) => acc + e) / size(v), 12)
        .as("mse"))
  }
}
