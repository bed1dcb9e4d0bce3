package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class PipelineSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // varied text long enough to clear the quality floor, with a
  // per-seed DISJOINT vocabulary (seed inside every word) so distinct
  // docs share no 3-grams — a shared cyclic pattern would make every
  // doc near-dup/contaminated with every other
  private def prose(seed: Int, words: Int = 60): String =
    (0 until words).map(i => s"w${seed}q${(i * 7) % 45}x")
      .mkString(" ")

  test("each stage drops its casualty; survivors chunk") {
    val benchText = "the secret benchmark answer phrase appears here " +
      prose(9)
    val corpus = Seq(
      (1L, "srcA", prose(1)),                    // clean: survives
      (2L, "srcA", "!!! ??? ***"),               // low quality: curated out
      (3L, "srcA", prose(3) + " the secret benchmark answer phrase"),
      // ^ contaminated: shares 3-grams with the benchmark
      (4L, "srcB", prose(4)),                    // near-dup pair with 5
      (5L, "srcB", prose(4) + " tail"),          // loses to min-id 4
      (6L, "srcB", prose(6))                     // clean: survives
    ).toDF("doc_id", "source", "text")
    val benchmark = Seq((100L, "eval", benchText))
      .toDF("doc_id", "source", "text")

    val out = Pipeline.prepareTrainingData(corpus, benchmark,
      "doc_id", "text", "source",
      minQuality = 0.4, maxRepetition = 0.9,
      nContamination = 3, nJaccard = 3, jaccardThreshold = 0.5,
      rates = Map.empty, defaultRate = 1.0, // keep every survivor
      chunkSize = 16, overlap = 4)

    val byDoc = out.collect().groupBy(_.getLong(0))
    byDoc.keySet shouldBe Set(1L, 4L, 6L)
    // 60 tokens at size 16 / stride 12: ceil((60-4)/12) = 5 chunks
    byDoc(1L).length shouldBe 5
    // chunk text reconstructs the doc head
    val first = byDoc(1L).minBy(_.getInt(1))
    first.getString(3) shouldBe prose(1).split(" ").take(16).mkString(" ")
  }

  test("idempotence: two runs (second on a fresh session) hash identical") {
    // guards the seeded-determinism discipline end-to-end: hash
    // sampling thresholds, connected-component label choice, chunk
    // boundaries — none may depend on partitioning, run order, or
    // session state
    val rows = (0L until 30L).map(i => (i, s"s${i % 3}", prose(i.toInt)))
    val bench = Seq((99L, "eval", "zz yy xx ww vv uu"))
    def run(s: org.apache.spark.sql.SparkSession): Map[String, Long] = {
      val sq = s.implicits
      import sq._
      val out = Pipeline.prepareTrainingData(
        rows.toDF("doc_id", "source", "text"),
        bench.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", minQuality = 0.0, maxRepetition = 1.0,
        nJaccard = 3, jaccardThreshold = 0.5,
        rates = Map("s0" -> 0.6, "s1" -> 0.3), defaultRate = 0.5,
        chunkSize = 16, overlap = 4)
      val m = out.collect()
        .map(r => s"${r.getLong(0)}#${r.getInt(1)}" ->
          (r.getString(3).hashCode.toLong + 31L * r.getInt(2)))
        .toMap
      TrackedCaches.releaseAll()
      m
    }
    val first = run(spark)
    val second = run(spark.newSession())
    second shouldBe first
    first should not be empty
  }

  test("sampling stage thins the surviving pool deterministically") {
    val corpus = (0L until 40L).map(i => (i, s"s${i % 2}", prose(i.toInt)))
      .toSeq.toDF("doc_id", "source", "text")
    val benchmark = Seq((99L, "eval", "zz yy xx ww vv uu"))
      .toDF("doc_id", "source", "text")
    val a = Pipeline.prepareTrainingData(corpus, benchmark,
      "doc_id", "text", "source", minQuality = 0.0, maxRepetition = 1.0,
      nJaccard = 3, jaccardThreshold = 0.99,
      rates = Map("s0" -> 1.0), defaultRate = 0.0,
      chunkSize = 64, overlap = 0)
      .select("doc_id").distinct().as[Long].collect().toSet
    a.foreach(id => (id % 2) shouldBe 0L) // only s0 stratum sampled
    a should not be empty
  }
}
