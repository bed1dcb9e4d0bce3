package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f)), // close to 1
    (3L, Array(0f, 1f, 0f)),
    (4L, Array(0f, 0.95f, 0.05f)), // close to 3
    (5L, Array(0f, 0f, 1f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssignExact recovers planted clusters and is " +
      "partition-invariant") {
    // three tight planted blobs far apart; k = 3, lowest-id init lands
    // one seed in each blob's id range after 2 rounds
    val blobs = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val base = Array.fill(4)(0f)
      base(c) = 10f
      (i, base.zipWithIndex.map { case (v, d) =>
        v + ((i * 7 + d) % 5) * 0.01f })
    }
    val df = blobs.toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssignExact(df, "vec_id", "embedding",
      k = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all members of a blob share a cluster, blobs are distinct
    val byBlob = (0 until 3).map(b =>
      (0L until 90L).filter(_ % 3 == b).map(got).toSet)
    byBlob.foreach(s => assert(s.size == 1))
    assert(byBlob.flatten.toSet.size == 3)
    // identical assignments under a different partitioning
    val got2 = Similarity.kmeansAssignExact(df.repartition(7), "vec_id",
      "embedding", k = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == got2)
    graft.operators.TrackedCaches.releaseAll()
  }

  test("cosine: exact values") {
    val c = vecs.filter($"vec_id" === 1).as("a")
      .crossJoin(vecs.filter($"vec_id" === 3).as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .first().getDouble(0)
    c shouldBe 0.0 +- 1e-12
  }

  test("bruteForceTopK returns nearest neighbors in order") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top.head shouldBe ((1L, 2L))
    top should have length 2
  }

  test("cosineNearDupPairs finds the two planted near pairs") {
    val pairs = Similarity.cosineNearDupPairs(vecs, 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L), (3L, 4L))
  }

  test("cosineNearDupPairs rejects an explicit nBlocks over the byte budget") {
    // 5 vectors x 3 dims x 8 B = 120 payload bytes; two blocks per task
    // with nBlocks=1 => 240 B, over a 100 B budget
    val ex = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(vecs, 0.9, nBlocks = 1,
        maxTaskBlockBytes = 100L)
    }
    ex.getMessage should include("budget")
    ex.getMessage should include("nBlocks")
  }

  test("cosineNearDupPairs auto-derives enough blocks for a tiny budget") {
    // auto path must SPLIT (not reject) under the same budget, and the
    // result must match the unconstrained run exactly
    val tight = Similarity.cosineNearDupPairs(vecs, 0.9,
        maxTaskBlockBytes = 100L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    tight shouldBe Set((1L, 2L), (3L, 4L))
  }

  test("lshTopK: same-bucket neighbors rank exactly (recall vs brute force)") {
    val brute = Similarity.bruteForceTopK(vecs, vecs, 1,
      idCol = "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // few planes on a tiny space: buckets stay coarse, top-1 must survive
    val lsh = Similarity.lshTopK(vecs, vecs, 1, nPlanes = 2, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every query that produced an answer must agree with brute force
    lsh.foreach { case (q, c) => brute(q) shouldBe c }
    lsh.keySet should not be empty
  }

  test("ivfTopK: probing all lists is exact; partial probe keeps recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = asSet(
      Similarity.bruteForceTopK(emb, qs, 3).toDF("qid", "cid", "cos"))
    val exact = asSet(
      Similarity.ivfTopK(emb, qs, 3, nLists = 4, nProbe = 4))
    exact shouldBe brute
    val approx = asSet(
      Similarity.ivfTopK(emb, qs, 3, nLists = 8, nProbe = 2))
    approx.size shouldBe 15 // 5 queries x k=3
    (approx intersect brute).size.toDouble / brute.size should be >= 0.5
  }

  test("ivfTopK accepts array<double> embeddings (l2Normalize output)") {
    // regression: the per-partition assignment read getSeq[Float] and
    // threw ClassCastException on double-typed vectors
    val dv = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val got = Similarity.ivfTopK(dv, dv.filter($"vec_id" === 1), 2,
        nLists = 2, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.head shouldBe ((1L, 2L)) // same answer as the float path
  }

  test("ivfTopK: sample-trained quantizer keeps full-probe exactness") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid").cast("long"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = asSet(
      Similarity.bruteForceTopK(emb, qs, 3).toDF("qid", "cid", "cos"))
    // train on half the corpus: with nProbe == nLists every candidate is
    // still scored exactly, so sampling the TRAINING set changes nothing
    val sampled = asSet(Similarity.ivfTopK(emb, qs, 3,
      nLists = 4, nProbe = 4, trainFraction = 0.5))
    sampled shouldBe brute
    // partial probe on a sampled quantizer still recalls
    val approx = asSet(Similarity.ivfTopK(emb, qs, 3,
      nLists = 8, nProbe = 3, trainFraction = 0.5))
    (approx intersect brute).size.toDouble / brute.size should be >= 0.5
  }

  test("semanticDedup equals the greedy min-id replay on real vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val survivors = Similarity.semanticDedup(emb, threshold = 0.4,
      nPlanes = 4).collect().map(_.getLong(0)).toSet
    // replay: bucket + exact cosine, kill anything with a smaller-id
    // bucket-mate at rounded cosine >= threshold
    val rows = emb.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), 4, 64, 42L).as("bkt"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = rows.filter { case (id, bkt, v) =>
      !rows.exists { case (id2, bkt2, v2) =>
        id2 < id && bkt2 == bkt &&
          BigDecimal(cos(v2, v)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.4
      }
    }.map(_._1).toSet
    survivors shouldBe expected
    survivors.size should be < rows.length // something was removed
  }

  test("semanticDedupAuto derives the plane count from corpus size") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    // 500 near-balanced vectors, occupancy 128: expectation floor =
    // 4 planes and the measured p99 (~31 per bucket) never escalates,
    // so the r13 measured-occupancy derivation must equal the
    // explicit 4-plane run
    ids(Similarity.semanticDedupAuto(emb, 0.4, targetOccupancy = 128)) shouldBe
      ids(Similarity.semanticDedup(emb, 0.4, nPlanes = 4))
    // occupancy 8 -> expectation ceil(log2(500/8)) = 6 planes; p99 at
    // 64 buckets (~15) stays under the 4x slack, so no escalation:
    // must equal the explicit 6-plane run
    ids(Similarity.semanticDedupAuto(emb, 0.4, targetOccupancy = 8)) shouldBe
      ids(Similarity.semanticDedup(emb, 0.4, nPlanes = 6))
    // sub-8 targets are rejected loudly (an occupancy bound below the
    // degree of any useful neighbor set is a misconfiguration)
    an[IllegalArgumentException] should be thrownBy
      Similarity.semanticDedupAuto(emb, 0.4, targetOccupancy = 1)
  }

  test("semanticDedup candidate generation is an equi-join, no cartesian") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.semanticDedup(emb, threshold = 0.4, nPlanes = 4)
      .queryExecution.executedPlan.toString
    plan should not include "Cartesian"
    plan should not include "BroadcastNestedLoop"
  }
}

class EmbeddingsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("groupCentroids: hand-computed per-group means in long form") {
    val df = Seq(
      ("a", Array(1f, 2f)), ("a", Array(3f, 6f)), ("b", Array(10f, 0f)))
      .toDF("src", "embedding")
    val rows = Embeddings.groupCentroids(df, "src")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .toSet
    rows shouldBe Set(
      ("a", 0, 2.0), ("a", 1, 4.0), ("b", 0, 10.0), ("b", 1, 0.0))
  }
}

class SkewSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key") {
    // 90% of fact rows share key 1 (the hot key)
    val big = spark.range(1000).select(
      when(col("id") < 900, 1L).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val small = Seq((1L, "hot"), (950L, "cold"), (2L, "unmatched-side"))
      .toDF("k", "label")
    val plain = big.join(small, "k")
      .select("k", "payload", "label").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "label").collect().toSet
    salted shouldBe plain
    plain.count(_.getLong(0) == 1L) shouldBe 900 // hot key fully matched
  }

  test("saltedJoin with salts=1 degrades to the plain join") {
    val big = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val small = Seq((1L, "a")).toDF("k", "s")
    Skew.saltedJoin(big, small, "k", 1).count() shouldBe 1L
  }

  test("saltedJoin preserves user columns named _salt on either side") {
    // regression: the internal salt column was literally "_salt", so a
    // same-named user column was silently clobbered (big side) or made
    // the join ambiguous (small side)
    val big = Seq((1L, "keep-me"), (2L, "me-too")).toDF("k", "_salt")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "label")
    val out = Skew.saltedJoin(big, small, "k", salts = 4)
      .select("k", "_salt", "label").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    out shouldBe Set((1L, "keep-me", "a"), (2L, "me-too", "b"))
    val small2 = Seq((1L, "x")).toDF("k", "_salt")
    Skew.saltedJoin(big.toDF("k", "payload"), small2, "k", 4)
      .select("k", "payload", "_salt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet shouldBe Set((1L, "keep-me", "x"))
  }
}

class EventsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ev = Seq(
    (1L, ts("2026-01-01 10:05:00"), 7L, "click", 1.0),
    (2L, ts("2026-01-01 10:25:00"), 7L, "click", 2.0),  // 20min gap: same sess
    (3L, ts("2026-01-01 10:50:00"), 7L, "buy", 4.0),    // 25min gap: same sess
    (4L, ts("2026-01-01 13:00:00"), 7L, "click", 8.0),  // new session
    (5L, ts("2026-01-01 10:10:00"), 9L, "click", 16.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("hourlyByType tumbles on the hour") {
    val rows = Events.hourlyByType(ev)
      .select(col("hour").cast("string"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    rows should contain(("2026-01-01 10:00:00", "click", 3L))
    rows should contain(("2026-01-01 10:00:00", "buy", 1L))
    rows should contain(("2026-01-01 13:00:00", "click", 1L))
  }

  test("sessionize splits on >30min gaps per user") {
    val sess = Events.sessionize(ev, gapMinutes = 30)
      .select("user_id", "sess_no", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sess shouldBe Set((7L, 1L, 3L), (7L, 2L, 1L), (9L, 1L, 1L))
  }

  test("rollingWindow: trailing RANGE frame per user, inclusive bounds") {
    // 30-minute window: event 2 sees 1+2; event 3 sees 2+3 (event 1 is
    // 45 min back, outside); event 4 sees only itself; user 9 isolated
    val got = Events.rollingWindow(ev, windowSeconds = 1800L)
      .select("event_id", "n_window", "sum_window").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got(1L) shouldBe ((1L, 1.0))
    got(2L) shouldBe ((2L, 3.0))
    got(3L) shouldBe ((2L, 6.0))
    got(4L) shouldBe ((1L, 8.0))
    got(5L) shouldBe ((1L, 16.0))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val cur = Seq((1L, "same text"), (2L, "new version"), (4L, "brand new"),
      (5L, null.asInstanceOf[String])) // NULL text is still PRESENT
      .toDF("doc_id", "text")
    val prev = Seq((1L, "same  text"), // whitespace-normalized: unchanged
      (2L, "old version"), (3L, "gone"),
      (5L, "was text"))
      .toDF("doc_id", "text")
    Dedup.snapshotDiff(cur, prev, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
        4L -> "added", 5L -> "changed")
  }
}
