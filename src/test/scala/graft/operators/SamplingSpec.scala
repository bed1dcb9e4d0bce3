package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val rows = (0L until 2000L).map(i => (i, s"s${i % 4}"))
    .toDF("id", "stratum")

  test("rate 0 keeps nothing; rate 1 keeps everything") {
    Sampling.hashSample(rows, "id", 0.0).count() shouldBe 0L
    Sampling.hashSample(rows, "id", 1.0).count() shouldBe 2000L
  }

  test("kept set is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(rows, "id", 0.3)
      .select("id").as[Long].collect().sorted
    val b = Sampling.hashSample(rows.repartition(13), "id", 0.3)
      .select("id").as[Long].collect().sorted
    a shouldBe b
    // observed fraction tracks the rate (md5 is uniform)
    a.length.toDouble / 2000 shouldBe 0.3 +- 0.05
  }

  test("salt re-randomizes the kept set") {
    val a = Sampling.hashSample(rows, "id", 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows, "id", 0.3, salt = "v2")
      .select("id").as[Long].collect().toSet
    a should not be b
    // overlap ~ rate^2, far below either set's size
    (a intersect b).size should be < (a.size min b.size)
  }

  test("consistent sampling aligns across tables sharing the key") {
    val other = rows.select(col("id"), lit("x").as("payload"))
    val a = Sampling.hashSample(rows, "id", 0.2)
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(other, "id", 0.2)
      .select("id").as[Long].collect().toSet
    a shouldBe b
  }

  test("stratifiedSample applies per-stratum rates and the default") {
    val got = Sampling.stratifiedSample(rows, "id", "stratum",
      Map("s0" -> 1.0, "s1" -> 0.0), defaultRate = 0.4)
    val bySt = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySt("s0") shouldBe 500L // rate 1: the whole stratum
    bySt.get("s1") shouldBe None // rate 0: gone
    bySt("s2").toDouble / 500 shouldBe 0.4 +- 0.07 // default rate
    bySt("s3").toDouble / 500 shouldBe 0.4 +- 0.07
  }

  test("capPerGroup keeps the deterministic top-k per group") {
    val df = Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "a", 9L),
      (4L, "a", 1L), (5L, "b", 2L)).toDF("id", "g", "v")
    // ties at v=9 break by id asc, so the a-cap keeps 2 and 3
    Sampling.capPerGroup(df, "g", "v", "id", maxPer = 2)
      .select("id").as[Long].collect().toSet shouldBe Set(2L, 3L, 5L)
    // cap above the group size keeps everything, schema unchanged
    val all = Sampling.capPerGroup(df, "g", "v", "id", maxPer = 10)
    all.count() shouldBe 5
    all.columns.toSeq shouldBe df.columns.toSeq
    // partitioning-independent
    Sampling.capPerGroup(df.repartition(7), "g", "v", "id", maxPer = 2)
      .select("id").as[Long].collect().toSet shouldBe Set(2L, 3L, 5L)
  }

  test("trainEvalSplit is complementary, covering, and hash-consistent") {
    val split = Sampling.trainEvalSplit(rows, "id", 0.25)
    split.count() shouldBe 2000L // covering: every row labeled
    val eval = split.filter(col("split") === "eval")
      .select("id").as[Long].collect().toSet
    eval.size.toDouble / 2000 shouldBe 0.25 +- 0.05
    // complementary with hashSample at the same rate: identical kept set
    eval shouldBe Sampling.hashSample(rows, "id", 0.25)
      .select("id").as[Long].collect().toSet
    // a salted split is independent of the unsalted one
    val eval2 = Sampling.trainEvalSplit(rows, "id", 0.25, salt = "fold2")
      .filter(col("split") === "eval").select("id").as[Long].collect().toSet
    eval2 should not be eval
  }

  test("kFold partitions the corpus; fold 0 == trainEvalSplit eval") {
    val folded = Sampling.kFold(rows, "id", k = 10)
    folded.count() shouldBe 2000L // covering
    val byFold = folded.groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byFold.keySet shouldBe (0 until 10).toSet
    byFold.values.foreach(n => n.toDouble / 200 shouldBe 1.0 +- 0.35)
    // the same hash+thresholds: fold 0 equals the 10% eval holdout
    val fold0 = folded.filter(col("fold") === 0)
      .select("id").as[Long].collect().toSet
    val eval10 = Sampling.trainEvalSplit(rows, "id", 0.1)
      .filter(col("split") === "eval").select("id").as[Long].collect().toSet
    fold0 shouldBe eval10
  }

  test("topKPerStratum takes exactly k deterministic rows per stratum") {
    val a = Sampling.topKPerStratum(rows, "id", "stratum", k = 7)
      .select("id").as[Long].collect().sorted
    a should have length 28 // 4 strata x 7
    // deterministic and partitioning-independent
    val b = Sampling.topKPerStratum(rows.repartition(11), "id", "stratum",
      k = 7).select("id").as[Long].collect().sorted
    a shouldBe b
    // k beyond the stratum size returns the whole stratum
    Sampling.topKPerStratum(rows, "id", "stratum", k = 1000)
      .count() shouldBe 2000L
  }

  test("tokenBudgetMix hits target token shares; scarcest kept whole") {
    // s0 is token-poor relative to its 50% target -> kept whole; the
    // others downsample toward share_s * B with B = tokens_s0 / 0.5
    val docs = (0L until 3000L)
      .map(i => (i, s"s${i % 3}", if (i % 3 == 0) 10 else 40))
      .toDF("doc_id", "source", "tc")
    val shares = Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)
    val kept = Sampling.tokenBudgetMix(docs, "doc_id", "source", "tc",
      shares)
    val keptTok = kept.groupBy("source").agg(sum("tc").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget B = 10,000 / 0.5 = 20,000
    keptTok("s0") shouldBe 10000L // rate 1.0: every s0 doc kept
    // expected s1 = 0.3 * 20000 = 6000, s2 = 0.2 * 20000 = 4000; the
    // md5 draw is deterministic (one fixed realization, not re-rollable),
    // so the slack must cover its actual binomial deviation (~25%)
    keptTok("s1").toDouble shouldBe 6000.0 +- 1500.0
    keptTok("s2").toDouble shouldBe 4000.0 +- 1000.0
    // deterministic
    Sampling.tokenBudgetMix(docs, "doc_id", "source", "tc", shares)
      .agg(sum("tc")).first().getLong(0) shouldBe
      kept.agg(sum("tc")).first().getLong(0)
    // strata without a target share are dropped entirely
    kept.select("source").distinct().count() shouldBe 3L
  }

  test("temperatureMix: alpha=1 natural, alpha=0 equal budgets, " +
      "alpha=0.5 sqrt-flattens; scarcest stratum kept whole") {
    // s0 has 10k tokens, s1 40k, s2 160k (1:4:16)
    val docs = (0L until 2100L).map { i =>
      val s = i % 3
      (i, s"s$s", (math.pow(4, s.toDouble) * 10000 / 700).toInt)
    }.toDF("doc_id", "source", "tc")
    val natural = Sampling.temperatureMix(docs, "doc_id", "source", "tc",
      alpha = 1.0)
    natural.count() shouldBe 2100L // rate 1 everywhere

    val flat = Sampling.temperatureMix(docs, "doc_id", "source", "tc",
      alpha = 0.0)
    val flatTok = flat.groupBy("source").agg(sum("tc").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    flatTok("s0") shouldBe 9800L // the whole scarce stratum (700 * 14)
    // equalized budgets: every stratum ~ s0's mass. The md5 draw is one
    // FIXED realization (not re-rollable) and s2's grains are 228
    // tokens, so the band must cover ~3 binomial SDs of that realization
    flatTok("s1").toDouble shouldBe 9800.0 +- 3500.0
    flatTok("s2").toDouble shouldBe 9800.0 +- 4500.0

    val half = Sampling.temperatureMix(docs, "doc_id", "source", "tc",
      alpha = 0.5)
    val halfTok = half.groupBy("source").agg(sum("tc").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    halfTok("s0") shouldBe 9800L
    // sqrt flattening: kept_s = sqrt(minTok * tok_s) -> 2x per step,
    // not the natural 4x
    halfTok("s1").toDouble shouldBe (9800.0 * 2) +- 4000.0
    halfTok("s2").toDouble shouldBe (9800.0 * 4) +- 8000.0
  }

  test("tokenBudgetMix realized shares stay in the variance-derived band") {
    // heavy-tailed (truncated-Pareto) doc lengths: the realized token
    // share is expectation-only; its deviation must stay within the
    // band the scaladoc formula derives from the ACTUAL lengths —
    // 4 sd, with sd_s = sqrt(rate_s (1 - rate_s) * sum len_i^2)
    val rng = new scala.util.Random(7L)
    val lens = (0L until 4000L).map { i =>
      val u = math.max(rng.nextDouble(), 1e-6)
      (i, s"s${i % 2}", math.min(5.0 / math.pow(u, 0.7), 1000.0).toInt + 1)
    }
    val docs = lens.toDF("doc_id", "source", "tc")
    val shares = Map("s0" -> 0.7, "s1" -> 0.3)
    val byS = lens.groupBy(_._2)
    val tok = byS.view.mapValues(_.map(_._3.toLong).sum).toMap
    val budget = shares.map { case (s, sh) => tok(s) / sh }.min
    val kept = Sampling.tokenBudgetMix(docs, "doc_id", "source", "tc",
        shares)
      .groupBy("source").agg(sum("tc").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.foreach { case (s, sh) =>
      val rate = math.min(1.0, sh * budget / tok(s))
      val sd = math.sqrt(rate * (1 - rate) *
        byS(s).map(d => d._3.toDouble * d._3).sum)
      val expect = sh * budget
      assert(math.abs(kept(s) - expect) <= math.max(4 * sd, 1.0),
        s"$s: kept ${kept(s)} vs expected $expect (sd $sd)")
    }
  }

  test("tokenBudgetMix accepts a double-typed token column") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 2}", 10.5))
      .toDF("doc_id", "source", "tc")
    val kept = Sampling.tokenBudgetMix(docs, "doc_id", "source", "tc",
      Map("s0" -> 0.5, "s1" -> 0.5))
    kept.filter(col("source") === "s0").count() shouldBe 150L
    assert(kept.filter(col("source") === "s1").count() <= 150L)
  }

  test("tokenBudgetMix rejects bad shares and missing strata") {
    val docs = Seq((1L, "a", 5)).toDF("doc_id", "source", "tc")
    an[IllegalArgumentException] should be thrownBy
      Sampling.tokenBudgetMix(docs, "doc_id", "source", "tc",
        Map("a" -> 0.5)) // shares don't sum to 1
    an[IllegalArgumentException] should be thrownBy
      Sampling.tokenBudgetMix(docs, "doc_id", "source", "tc",
        Map("a" -> 0.5, "ghost" -> 0.5)) // stratum absent from the data
  }

  test("hexThreshold edge values") {
    Sampling.hexThreshold(0.0) shouldBe "00000000"
    Sampling.hexThreshold(0.25) shouldBe "40000000"
    Sampling.hexThreshold(0.5) shouldBe "80000000"
    Sampling.hexThreshold(1.0) shouldBe "g"
    an[IllegalArgumentException] should be thrownBy Sampling.hexThreshold(1.5)
  }

  test("weightedSample: inclusion tracks weight; deterministic; " +
      "non-positive weights excluded") {
    // 200 rows, half weight 1.0 and half 0.05: across 20 salts the
    // heavy rows must dominate the k=40 sample
    val df = Seq.tabulate(200)(i =>
      (i.toLong, if (i % 2 == 0) 1.0 else 0.05)).toDF("id", "w")
    val heavyShare = (1 to 20).map { s =>
      val kept = Sampling.weightedSample(df, "id", "w", k = 40,
        salt = s"s$s").collect().map(_.getLong(0))
      kept.count(_ % 2 == 0).toDouble / kept.length
    }
    (heavyShare.sum / heavyShare.size) should be > 0.8
    // same salt => identical sample
    def ids(salt: String) = Sampling.weightedSample(df, "id", "w", 40,
      salt).collect().map(_.getLong(0)).toSeq
    ids("x") shouldBe ids("x")
    // zero/negative weights never appear
    val withBad = df.union(Seq((900L, 0.0), (901L, -1.0)).toDF("id", "w"))
    Sampling.weightedSample(withBad, "id", "w", k = 300)
      .collect().map(_.getLong(0)).toSet
      .intersect(Set(900L, 901L)) shouldBe Set.empty
    // top-k plans as TakeOrdered (no global sort materialization)
    Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString should
      include("TakeOrderedAndProject")
  }

  test("dsirLogWeights favors documents that look like the target") {
    // target talks about "alpha beta"; raw docs 1-2 match the target
    // vocabulary, 3-4 are off-domain — their log-weights must be lower
    val target = Seq((100L, "alpha beta alpha beta gamma"),
      (101L, "alpha beta alpha"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta"), // on-domain
      (2L, "alpha gamma"),
      (3L, "zork quux blorp fnord"), // off-domain
      (4L, "zork zork quux"))
      .toDF("doc_id", "text")
    val w = Sampling.dsirLogWeights(raw, target, "doc_id", "text",
        nBuckets = 64, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w.keySet shouldBe Set(1L, 2L, 3L, 4L)
    w(1L) should be > w(3L)
    w(1L) should be > w(4L)
    w(2L) should be > w(3L)
    // per-token additivity: doubling a doc's tokens doubles its weight
    val doubled = Sampling.dsirLogWeights(
      Seq((9L, "alpha beta"), (10L, "alpha beta alpha beta"))
        .toDF("doc_id", "text"),
      target, "doc_id", "text", nBuckets = 64, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    doubled(10L) shouldBe (2 * doubled(9L) +- 1e-9)
  }

  test("systematicTokenSample: exactly the boundary-straddling docs, " +
      "verified against a local replay of the global order") {
    val df = (1L to 200L).map(i => (i, 1L + (i % 7))).toDF("id", "tc")
    val stride = 50L
    val got = Sampling.systematicTokenSample(df, "id", "tc", stride)
      .collect().map(r => r.getLong(0)).sorted
    // local replay: same (md5(id || "#order"), id) total order
    def key(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#order".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val ordered = (1L to 200L).map(i => (i, 1L + (i % 7)))
      .sortBy { case (id, _) => (key(id), id) }
    var cum = 0L
    val expect = ordered.flatMap { case (id, tc) =>
      val hit = ((cum + tc - 1) / stride) * stride >= cum
      cum += tc
      if (hit) Some(id) else None
    }.sorted
    got.toSeq shouldBe expect
    // spacing: one doc per stride window of the token stream
    val total = ordered.map(_._2).sum
    expect.length shouldBe ((total + stride - 1) / stride)
  }

  test("systematicTokenSample: deterministic across repartition; " +
      "zero-token docs never selected") {
    val df = (1L to 100L).map(i => (i, if (i % 10 == 0) 0L else 3L))
      .toDF("id", "tc")
    val a = Sampling.systematicTokenSample(df, "id", "tc", 20L)
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.systematicTokenSample(df.repartition(7), "id", "tc", 20L)
      .collect().map(_.getLong(0)).sorted
    a.toSeq shouldBe b.toSeq
    a.foreach(id => (id % 10) should not be 0L)
  }
}
