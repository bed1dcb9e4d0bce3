package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ManifestsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("filterUnseen == plain anti-join, any fpp (bloom is prune-only)") {
    val history = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"), // re-crawl of a seen page
      (11L, "delta"), // new
      (12L, "beta"),  // re-crawl
      (13L, "epsilon"), (14L, "zeta")).toDF("doc_id", "text")
    val path = tmp("manifest-seen") + "/m"
    Manifests.writeSeenManifest(history, "text", path)
    // a sloppy bloom (high fpp) must not change the RESULT, only the
    // pruned fraction — exactness is the anti-join's job
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Manifests.filterUnseen(batch, "text",
          Manifests.readSeenManifest(spark, path), fpp = fpp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(11L, 13L, 14L), s"fpp=$fpp")
    }
    TrackedCaches.releaseAll()
  }

  test("deltaStats: per-group new/seen counts incl. batch-internal dups") {
    val history = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      ("web", "alpha"), ("web", "alpha"), // two seen rows (not deduped)
      ("web", "new1"),
      ("wiki", "beta"), ("wiki", "new2"), ("wiki", "new3"))
      .toDF("source", "text")
    val path = tmp("manifest-delta") + "/m"
    Manifests.writeSeenManifest(history, "text", path)
    val got = Manifests.deltaStats(batch, "text", "source",
        Manifests.readSeenManifest(spark, path))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("web" -> (1L, 2L), "wiki" -> (2L, 1L)))
  }

  test("KMV merge of two runs == KMV sketch of the union (mergeability)") {
    // two overlapping runs; the defining KMV property is that merging
    // the k-row sidecars reproduces the sketch of the concatenation
    val runA = (0 until 400).map(i => ("s" + i % 2, "key" + i))
      .toDF("source", "key")
    val runB = (200 until 700).map(i => ("s" + i % 2, "key" + i))
      .toDF("source", "key")
    val merged = Manifests.kmvMergeEstimate(Seq(
        Manifests.kmvManifest(runA, "source", "key", 32),
        Manifests.kmvManifest(runB, "source", "key", 32)),
      "source", 32)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val direct = Sketches.kmvDistinct(runA.unionByName(runB),
        "source", "key", 32)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(merged == direct)
    // and the estimate is in a sane band around the true 700/2 = 350
    merged.values.foreach { case (nKept, est) =>
      assert(nKept == 32L && est > 200 && est < 550, merged)
    }
  }

  test("KMV manifest survives the parquet roundtrip bit-for-bit") {
    val run = (0 until 300).map(i => ("s", "k" + i)).toDF("source", "key")
    val dir = tmp("manifest-kmv")
    Manifests.writeKmvManifest(run, "source", "key", 16, s"$dir/m")
    val back = Manifests.readKmvManifest(spark, s"$dir/m")
      .orderBy("f").collect().map(_.getDouble(1)).toSeq
    val direct = Manifests.kmvManifest(run, "source", "key", 16)
      .orderBy("f").collect().map(_.getDouble(1)).toSeq
    assert(back == direct && back.size == 16)
  }

  test("updatedSeenManifest closes the loop: re-probe drops everything") {
    val history = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq((3L, "alpha"), (4L, "gamma"), (5L, "gamma"))
      .toDF("doc_id", "text")
    val path = tmp("manifest-upd") + "/m"
    Manifests.writeSeenManifest(history, "text", path)
    val updated = Manifests.updatedSeenManifest(
      Manifests.readSeenManifest(spark, path), batch, "text")
    // alpha, beta, gamma — batch-internal dups and re-crawls deduped
    assert(updated.count() == 3L)
    // the defining property: a second pass of the SAME batch against
    // the updated manifest finds nothing new
    val again = Manifests.filterUnseen(batch, "text", updated)
    assert(again.count() == 0L)
    TrackedCaches.releaseAll()
  }

  test("small groups report exact counts (sketch not full)") {
    val run = Seq(("tiny", "a"), ("tiny", "b"), ("tiny", "a"))
      .toDF("source", "key")
    val got = Manifests.kmvMergeEstimate(
        Seq(Manifests.kmvManifest(run, "source", "key", 16)),
        "source", 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("tiny", 2L, 2.0)))
  }

  test("filterUnseen plan: bloom probe on the scan + left-anti confirm") {
    val history = spark.range(0, 100).select(col("id").cast("string").as("text"))
    val batch = spark.range(50, 200)
      .select(col("id").as("doc_id"), col("id").cast("string").as("text"))
    val path = tmp("manifest-plan") + "/m"
    Manifests.writeSeenManifest(history, "text", path)
    val df = Manifests.filterUnseen(batch, "text",
      Manifests.readSeenManifest(spark, path))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"bloom probe missing from plan:\n$plan")
    assert(plan.toLowerCase.contains("leftanti"),
      s"anti-join confirm missing from plan:\n$plan")
    assert(df.count() == 100L) // 100..199 unseen
    TrackedCaches.releaseAll()
  }
}
