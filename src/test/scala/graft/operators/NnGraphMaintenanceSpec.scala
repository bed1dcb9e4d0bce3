package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the incremental-ANN-maintenance contract: upsert/delete on a
  * layered index must reproduce the FULL REBUILD row for row — the
  * equality that lets a daily-append pipeline skip the O(corpus)
  * rebuild while the DuckDB oracle keeps gating the result through
  * the existing full-graph SQL twin. Edges live only within a bucket
  * per layer, so touched-bucket recompute + untouched-row keep is
  * exact, not approximate. */
class NnGraphMaintenanceSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private def rows(df: DataFrame): Set[(Int, Long, Long, Long)] =
    df.select(col("layer"), col("bkt"), col("src"), col("dst"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("flatten(nnGraphLayered) equals nnGraph exactly") {
    val direct = Similarity.nnGraph(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = Similarity.flattenNnGraph(
      Similarity.nnGraphLayered(emb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == direct)
  }

  test("upsert of a fresh batch equals the full rebuild row for row") {
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0)
    val upserted = Similarity.nnGraphUpsert(
      Similarity.nnGraphLayered(old), old, fresh)
    val rebuilt = Similarity.nnGraphLayered(emb)
    assert(rows(upserted) == rows(rebuilt))
  }

  test("upsert keeps untouched-bucket rows verbatim (the incremental " +
    "guarantee, not a silent rebuild)") {
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0)
    val idx = Similarity.nnGraphLayered(old)
    // buckets the batch lands in, per layer
    val touched = Seq(42L, 43L).zipWithIndex.map { case (s, i) =>
      fresh.select(Similarity.lshBucket(col("embedding"), 4, 64, s)
        .as("bkt")).distinct().collect().map(_.getLong(0)).toSet -> i
    }.map(_._1)
    val keptExpected = rows(idx).filterNot { case (l, b, _, _) =>
      touched(l).contains(b) }
    assert(keptExpected.subsetOf(rows(
      Similarity.nnGraphUpsert(idx, old, fresh))),
      "untouched-bucket index rows must survive the upsert unchanged")
    // and on this corpus the batch must NOT touch every bucket, or
    // the test shows nothing
    assert(keptExpected.nonEmpty, "degenerate fixture: every bucket touched")
  }

  test("delete heals adjacency to equal the rebuild of survivors") {
    val dead = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
    val survivors = emb.filter(col("vec_id") % 10 =!= 0)
    val healed = Similarity.nnGraphDelete(
      Similarity.nnGraphLayered(emb), emb, dead)
    val rebuilt = Similarity.nnGraphLayered(survivors)
    assert(rows(healed) == rows(rebuilt))
  }

  test("graphIndexStale flips when occupancy outgrows the layout") {
    // testdata at 4 planes is the fresh layout: not stale
    val fresh = Similarity.graphIndexStale(emb, currentPlanes = 4)
      .head()
    assert(fresh.getInt(2) == 4 && !fresh.getBoolean(3))
    // 10x the corpus under the SAME pinned layout: expectation alone
    // (log2(20000/128) = 8) exceeds 4 planes, so the measured
    // recommendation must flag the rebuild
    val big = (0 until 10).map(c => emb.select(
      (col("vec_id") + lit(c * 100000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
    val stale = Similarity.graphIndexStale(big, currentPlanes = 4).head()
    assert(stale.getInt(2) > 4 && stale.getBoolean(3))
  }
}
