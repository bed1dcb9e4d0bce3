package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

class ProfileSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(2.5), Some("ab"), Some(Date.valueOf("2020-01-01"))),
    (Some(2L), None, Some("xyz"), None),
    (Some(2L), Some(-1.0), None, Some(Date.valueOf("2020-01-02"))),
    (None, Some(4.0), Some(""), Some(Date.valueOf("2020-01-02"))))
    .toDF("k", "v", "s", "d")

  private def prof(cols: String*): Map[(String, String), Double] =
    Profile.profile(df, cols)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("numeric metrics: nulls, exact distinct, extremes, decimal sum") {
    val m = prof("k", "v")
    m(("k", "n_null")) shouldBe 1.0
    m(("k", "n_distinct")) shouldBe 2.0
    m(("k", "min_val")) shouldBe 1.0
    m(("k", "max_val")) shouldBe 2.0
    m(("k", "sum_val")) shouldBe 5.0
    m(("v", "n_null")) shouldBe 1.0
    m(("v", "n_distinct")) shouldBe 3.0
    m(("v", "min_val")) shouldBe -1.0
    m(("v", "max_val")) shouldBe 4.0
    m(("v", "sum_val")) shouldBe 5.5
  }

  test("string metrics are length-based; other kinds get the universal two") {
    val m = prof("s", "d")
    m(("s", "n_null")) shouldBe 1.0
    m(("s", "n_distinct")) shouldBe 3.0
    m(("s", "min_len")) shouldBe 0.0
    m(("s", "max_len")) shouldBe 3.0
    m(("s", "sum_len")) shouldBe 5.0
    m(("d", "n_null")) shouldBe 1.0
    m(("d", "n_distinct")) shouldBe 2.0
    m.keySet.filter(_._1 == "d").map(_._2) shouldBe
      Set("n_null", "n_distinct")
  }

  test("exactly two scans: a moments pass and a distinct pass") {
    // AQE off: the adaptive wrapper hides the scan nodes pre-execution
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val plan = Profile.profile(li, Seq("l_orderkey", "l_quantity",
        "l_returnflag")).queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.length shouldBe 2
      // the approx flavor needs no Expand and folds into ONE scan
      val approxScans = Profile.profile(li, Seq("l_orderkey", "l_quantity",
        "l_returnflag"), approxDistinct = true)
        .queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
      approxScans.length shouldBe 1 // HLL rides the moments agg: 1 scan
    } finally spark.conf.set(key, prev)
  }

  test("approx distinct swaps only the distinct expression") {
    val exact = prof("k", "v")
    val m = Profile.profile(df, Seq("k", "v"), approxDistinct = true)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // tiny cardinalities: the HLL sketch is exact here
    m(("k", "n_distinct")) shouldBe 2.0
    (m - (("k", "n_distinct")) - (("v", "n_distinct"))) shouldBe
      (exact - (("k", "n_distinct")) - (("v", "n_distinct")))
  }

  test("zscoreBy: exact moments, degenerate single-row group gets null") {
    val data = Seq((1L, "a", 2L), (2L, "a", 4L), (3L, "a", 6L),
      (4L, "b", 7L)).toDF("id", "g", "v")
    val got = Profile.zscoreBy(data, "g", "v")
      .select("id", "zscore").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // group a: mean 4, sample var ((4+16+36) - 12^2/3)/2 = 4, sd 2
    got(1L) shouldBe Some(-1.0)
    got(2L) shouldBe Some(0.0)
    got(3L) shouldBe Some(1.0)
    got(4L) shouldBe None // n = 1: no sample variance
  }

  test("zscoreBy: zero-variance group gets null, output keeps all rows") {
    val data = Seq((1L, "c", 5L), (2L, "c", 5L), (3L, "c", 5L))
      .toDF("id", "g", "v")
    val got = Profile.zscoreBy(data, "g", "v").collect()
    got.length shouldBe 3
    got.foreach(r => assert(r.isNullAt(r.fieldIndex("zscore"))))
  }

  test("expectations: per-rule violation counts, NULL predicate = violation") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some("ok"), Some(10L)),
      (2L, None: Option[String], Some(5L)),  // null text
      (3L, Some("x"), None: Option[Long]),   // null n -> NULL predicate
      (1L, Some("dup"), Some(-1L))           // dup id + negative n
    ).toDF("id", "text", "n")
    val out = Profile.expectations(df, Seq(
        ("text_not_null", col("text").isNotNull),
        ("n_positive", col("n") > 0)),
      uniqueKey = Some("id")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out("text_not_null") shouldBe (1L, 4L)
    // id 3 has NULL n (un-evaluable = failed) + id 1-dup has -1 -> 2
    out("n_positive") shouldBe (2L, 4L)
    out("unique_id") shouldBe (1L, 4L)
  }

  test("expectations: clean data reports zero violations everywhere") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val out = Profile.expectations(df,
        Seq(("text_not_null", col("text").isNotNull)),
        uniqueKey = Some("id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.values.sum shouldBe 0L
  }

  test("datasetCard: hand-computed metrics incl. dup and null rates") {
    val df = Seq(
      (1L, "hello world", "s1", "en", 11L),
      (2L, "hello world", "s1", "en", 11L), // exact dup
      (3L, "other text here", "s2", "de", 15L),
      (4L, null.asInstanceOf[String], "s2", "de", 0L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val m = Profile.datasetCard(df, "text", "source", "lang", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    m("n_docs") shouldBe 4.0
    m("n_sources") shouldBe 2.0
    m("n_langs") shouldBe 2.0
    m("total_tokens") shouldBe 7.0 // 2 + 2 + 3, null text skipped
    m("total_chars") shouldBe 37.0
    m("exact_dup_rate") shouldBe BigDecimal(1.0 - 2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    m("null_text_rate") shouldBe 0.25
    m("p50_chars") shouldBe 11.0
  }

  test("the static lineitem kind list matches the live Spark schema") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    SparkEntry.lineitemProfileCols.foreach { case (c, k) =>
      Profile.kindOf(li.schema(c).dataType) shouldBe k
    }
    li.schema.fieldNames.toSet shouldBe
      SparkEntry.lineitemProfileCols.map(_._1).toSet
  }
}
