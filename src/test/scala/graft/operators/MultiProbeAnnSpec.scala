package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Multi-probe graph ANN on a CLUSTERED DGP — the shape real
  * embedding corpora have (VERDICT r12 #3). The near-random testdata
  * vectors are the pessimal case for any LSH index (neighbors carry
  * barely more cosine than strangers); planted clusters are where the
  * probe lever must prove itself: same-cluster neighbors split by one
  * marginal hyperplane get reconnected by probing that plane's flip.
  *
  * Bars pinned here: mean recall@5 >= 0.8 on the clustered DGP with
  * probes=2 (the VERDICT bar), and multi-probe must dominate the
  * single-probe build on the same corpus/seeds. */
class MultiProbeAnnSpec extends AnyFunSuite with SparkSpec {

  /** 32-centroid gaussian mixture, the ScaleRehearsal embeddings
    * recipe (center scale 2.0, within-cluster noise 0.7, 64-dim). */
  private def clustered(n: Int): DataFrame = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val rows = (0 until n).map { id =>
      val cRng = new scala.util.Random(mix(id % 32) ^ 0xC3C3C3L)
      val vRng = new scala.util.Random(mix(id.toLong) ^ 0xE1E1E1L)
      val v = Array.fill(64)(
        (cRng.nextGaussian() * 2.0 + vRng.nextGaussian() * 0.7).toFloat)
      Row(id.toLong, v.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def meanRecall(e: DataFrame, g: DataFrame): Double = {
    val q = e.filter(col("vec_id") < 20)
    Similarity.graphAnnRecall(e, q, g, k = 5)
      .agg(avg("recall")).head().getDouble(0)
  }

  test("clustered DGP: probes=2 graph reads mean recall@5 >= 0.8 " +
    "and dominates the single-probe build") {
    val e = clustered(2000).cache()
    try {
      val mp = meanRecall(e,
        Similarity.nnGraphMultiProbe(e, nPlanes = 4, probes = 2))
      val sp = meanRecall(e, Similarity.nnGraph(e, nPlanes = 4))
      assert(mp >= 0.8, s"multi-probe recall@5 $mp < 0.8")
      assert(mp >= sp, s"multi-probe $mp must dominate single-probe $sp")
    } finally e.unpersist()
  }

  test("flip choice is the quantized-margin rank: probes <= nPlanes " +
    "enforced, probes=nPlanes probes every 1-bit neighbor") {
    val e = clustered(300).cache()
    try {
      intercept[IllegalArgumentException] {
        Similarity.nnGraphMultiProbe(e, nPlanes = 4, probes = 5)
      }
      // probing ALL planes can only add candidates over probes=2:
      // edge set of probes=2 need not be a subset (top-degree cut),
      // but the recall meter must not degrade below the 2-probe one
      // by more than the rank-cut wiggle on this tiny corpus
      val r4 = meanRecall(e,
        Similarity.nnGraphMultiProbe(e, nPlanes = 4, probes = 4))
      val r2 = meanRecall(e,
        Similarity.nnGraphMultiProbe(e, nPlanes = 4, probes = 2))
      assert(r4 >= r2 - 0.1, s"probes=4 recall $r4 far below probes=2 $r2")
    } finally e.unpersist()
  }

  test("multi-probe graph stays bucket-bounded: no cartesian product " +
    "in the build plan") {
    val e = clustered(300)
    val plan = Similarity.nnGraphMultiProbe(e, nPlanes = 4, probes = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"probe join must stay equi:\n$plan")
  }
}
