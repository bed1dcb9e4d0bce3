package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the occupancy-derived plane count on the THREE corpora that
  * matter: every testdata SF must derive exactly 4 planes — the value
  * the inlined-literal SQL twins of q_ann_graph_mp_* and
  * q_mutual_nn_auto assume — and a cluster-skewed corpus must
  * escalate past the balanced-split expectation (the whole point of
  * measuring the tail instead of trusting n/target). A driver
  * testdata regeneration that broke either assumption would surface
  * HERE, not as a silent oracle mismatch. */
class OccupancyPlanesSpec extends AnyFunSuite with SparkSpec {

  test("every testdata SF derives exactly 4 planes (the oracle " +
    "literal) for embeddings") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val p = Similarity.occupancyPlanes(e, e.count(),
        targetOccupancy = 128, dim = 64, seed = 42L,
        vecCol = "embedding")
      assert(p == 4, s"$sf derived $p planes; the inlined 4-plane " +
        "oracles (q_ann_graph_mp_*, q_mutual_nn_auto) would break")
    }
  }

  test("a single-cluster corpus escalates past the expectation " +
    "estimate") {
    // 6000 copies of one tight cluster: every vector agrees with the
    // centroid on every plane that misses the cluster, so the
    // expectation formula (log2(6000/128) ~ 6 planes) leaves one
    // bucket holding nearly everything until planes CUT the cluster
    val rng = new scala.util.Random(7)
    val center = Array.fill(64)(rng.nextGaussian() * 2.0)
    val rows = (0 until 6000).map { i =>
      val r2 = new scala.util.Random(i)
      Row(i.toLong,
        center.map(c => (c + r2.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val e = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val expect = math.max(4, math.ceil(
      math.log(6000.0 / 128) / math.log(2)).toInt)
    val p = Similarity.occupancyPlanes(e, 6000L, targetOccupancy = 128,
      dim = 64, seed = 42L, vecCol = "embedding")
    assert(p > expect,
      s"skewed corpus must escalate: derived $p <= expectation $expect")
  }

  test("an empty corpus returns the floored expectation estimate " +
    "instead of NPEing on a null percentile") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val e = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    // pre-fix this threw: groupBy over zero rows -> percentile null ->
    // head().getDouble NPE; the Auto operators must return empty on
    // empty input, not crash
    assert(Similarity.occupancyPlanes(e, 0L, targetOccupancy = 128,
      dim = 64, seed = 42L, vecCol = "embedding") == 4)
    assert(Similarity.semanticDedupAuto(e, threshold = 0.9).count() == 0L)
  }
}
