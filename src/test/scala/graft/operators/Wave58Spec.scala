package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.Lcs

/** Round-12 wave 58: GRPO advantages, threshold sweeps, ROUGE-L. */
class Wave58Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("groupAdvantage: standardized within the prompt group, " +
    "zero-variance and singleton groups read 0") {
    // group p1: rewards 1, 3 -> mean 2, std_pop 1 -> advantages -1, 1
    val df = Seq(("p1", 1L, 1L), ("p1", 2L, 3L),
      ("p2", 1L, 5L), ("p2", 2L, 5L), // zero variance
      ("p3", 1L, 9L)) // singleton
      .toDF("prompt", "sample", "reward")
    val r = Eval.groupAdvantage(df, "prompt", "sample", "reward")
      .orderBy("prompt", "sample").collect()
    r.map(_.getDouble(4)) shouldBe Array(-1.0, 1.0, 0.0, 0.0, 0.0)
  }

  test("groupAdvantage: advantages sum to ~0 within every group") {
    val df = (1 to 60).map(i =>
      (s"p${i % 5}", i.toLong, (i * 7 % 23).toLong))
      .toDF("prompt", "sample", "reward")
    val sums = Eval.groupAdvantage(df, "prompt", "sample", "reward")
      .groupBy("prompt")
      .agg(org.apache.spark.sql.functions.sum("advantage"))
      .collect().map(_.getDouble(1))
    all(sums.map(math.abs)) should be < 1e-4
  }

  test("thresholdSweep: monotone non-increasing kept counts; " +
    "boundary uses the rounded score") {
    val df = Seq((0.1, 10L), (0.3, 20L), (0.5, 30L), (0.9, 40L))
      .toDF("s", "w")
    val r = Profile.thresholdSweep(df, "s", "w",
      Seq(0.0, 0.3, 0.5, 1.0)).orderBy("tau").collect()
    r.map(_.getLong(1)) shouldBe Array(4L, 3L, 2L, 0L)
    r.map(_.getLong(2)) shouldBe Array(100L, 90L, 70L, 0L)
    r.map(_.getDouble(4)) shouldBe Array(1.0, 0.9, 0.7, 0.0)
  }

  test("Lcs.lcsTokens: classic DP cases") {
    Lcs.lcsTokens("a b c d e", "a x c y e") shouldBe 3L
    Lcs.lcsTokens("a b c", "c b a") shouldBe 1L
    Lcs.lcsTokens("x y z", "x y z") shouldBe 3L
    Lcs.lcsTokens("", "a b") shouldBe 0L
    Lcs.lcsTokens("A  B", "a b") shouldBe 2L // lower + clean split
  }

  test("rougeL: hand P/R/F for a partial overlap") {
    // cand 'a b c d' vs ref 'a c': lcs 2, P=0.5, R=1.0, F=2/3
    val r = Eval.rougeL(Seq((1L, "a b c d", "a c"))
      .toDF("id", "cand", "ref"), "id", "cand", "ref").head()
    r.getLong(1) shouldBe 2L
    r.getDouble(4) shouldBe 0.5
    r.getDouble(5) shouldBe 1.0
    r.getDouble(6) shouldBe 0.666667 +- 1e-6
  }

  test("rougeL: engine LCS matches the committed Python fixture on " +
    "sf0.001 (reversed-token reference)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"text".isNotNull)
    import org.apache.spark.sql.functions._
    // join against the committed fixture CSV
    val fx = spark.read.option("header", "true")
      .csv("src/test/resources/rouge_lcs.csv")
      .select($"fp", $"lcs".cast("long").as("lcs_py"))
    val joined = docs.select(md5($"text").as("fp"), $"doc_id")
      .join(fx, Seq("fp"))
      .join(Eval.rougeL(
        docs.withColumn("ref", array_join(reverse(
          graft.functions.TextFunctions.cleanTokens($"text")), " ")),
        "doc_id", "text", "ref").select($"doc_id", $"lcs"),
        Seq("doc_id"))
    joined.filter($"lcs" =!= $"lcs_py").count() shouldBe 0L
    joined.count() shouldBe 500L
  }
}
