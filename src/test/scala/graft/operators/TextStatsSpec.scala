package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Hand-computed pins for the round-7 text statistics: Kneser-Ney
  * bigram smoothing, median/MAD robust z, Flesch readability, and the
  * Heaps-law vocabulary coefficient. */
class TextStatsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("kneserNeyTop: hand-computed probabilities on a 2-doc corpus") {
    val docs = Seq("a b a b", "a c").toDF("text")
    val out = TextQuality.kneserNeyTop(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // pc: (a,b)=2 (b,a)=1 (a,c)=1; c_a(a)=3 n1+(a,.)=2; c_a(b)=1
    // n1+(b,.)=1; n1+(.,b)=1 n1+(.,a)=1 n1+(.,c)=1; types=3
    // P(b|a) = 1.25/3 + (.75*2/3)*(1/3) = .583333
    // P(a|b) = .25/1  + (.75*1/1)*(1/3) = .5
    // P(c|a) = .25/3  + (.75*2/3)*(1/3) = .25
    out(("a", "b")) shouldBe (2L, 0.583333)
    out(("b", "a")) shouldBe (1L, 0.5)
    out(("a", "c")) shouldBe (1L, 0.25)
  }

  test("kneserNeyTop: observed continuations of a context sum under 1 " +
      "(discount mass reserved for unseen)") {
    val docs = Seq("x y x z x y", "x w").toDF("text")
    val rows = TextQuality.kneserNeyTop(docs, "text").collect()
    val fromX = rows.filter(_.getString(0) == "x").map(_.getDouble(3)).sum
    fromX should be < 1.0
    fromX should be > 0.5
  }

  test("robustZ: median/MAD pin with one gross outlier") {
    val df = Seq((1L, "g", 1L), (2L, "g", 2L), (3L, "g", 3L),
      (4L, "g", 4L), (5L, "g", 100L)).toDF("id", "g", "v")
    val out = TextQuality.robustZ(df, "g", "v").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          Option(r.getAs[Any]("rz")).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("is_outlier"))).toMap
    // sorted 1,2,3,4,100: disc median = 3; absdevs 2,1,0,1,97 -> MAD 1
    out(3L)._1 shouldBe 3.0
    out(3L)._2 shouldBe 1.0
    out(3L)._3 shouldBe Some(0.0)
    out(3L)._4 shouldBe false
    val expected = BigDecimal(97.0 / 1.4826)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(5L)._3 shouldBe Some(expected)
    out(5L)._4 shouldBe true
    // the mean z-score would be dragged by the outlier itself; the
    // robust one keeps the inliers near zero
    out(1L)._3.get.abs should be < 2.0
  }

  test("robustZ: zero MAD yields null score, never a blow-up") {
    val df = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 5L),
      (4L, "g", 9L)).toDF("id", "g", "v")
    val out = TextQuality.robustZ(df, "g", "v").collect()
    out.foreach { r => r.isNullAt(r.fieldIndex("rz")) shouldBe true }
    out.foreach(_.getAs[Boolean]("is_outlier") shouldBe false)
  }

  test("readability: hand-computed Flesch") {
    val df = Seq((1L, "hello world. nice day")).toDF("doc_id", "text")
    val r = TextQuality.readability(df, "doc_id", "text").collect().head
    r.getAs[Long]("n_words") shouldBe 4L
    r.getAs[Long]("n_sents") shouldBe 1L
    // hello(2) world.(1) nice(2) day(1)
    r.getAs[Long]("n_syll") shouldBe 6L
    // 206.835 - 1.015*4/1 - 84.6*6/4 = 75.875
    r.getAs[Double]("flesch") shouldBe 75.875
  }

  test("readability: sentence floor prevents division blow-up") {
    val df = Seq((1L, "no punctuation here")).toDF("doc_id", "text")
    val r = TextQuality.readability(df, "doc_id", "text").collect().head
    r.getAs[Long]("n_sents") shouldBe 1L
    r.getAs[Double]("flesch").isNaN shouldBe false
  }

  test("heapsLaw: hand-computed beta; degenerate single-token group null") {
    val df = Seq(("s", "a b c a"), ("t", "x")).toDF("source", "text")
    val out = TextQuality.heapsLaw(df, "source", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    out("s").getAs[Long]("n_tokens") shouldBe 4L
    out("s").getAs[Long]("n_distinct") shouldBe 3L
    out("s").getAs[Double]("beta") shouldBe BigDecimal(
      math.log(3.0) / math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out("t").isNullAt(out("t").fieldIndex("beta")) shouldBe true
  }

  test("heapsLaw separates random-id text (beta~1) from repetition (beta~0)") {
    val random = (1 to 400).map(i => s"tok$i").mkString(" ")
    val repeated = (1 to 400).map(_ => "same").mkString(" ")
    val df = Seq(("rand", random), ("rep", repeated)).toDF("source", "text")
    val out = TextQuality.heapsLaw(df, "source", "text").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("beta")).toMap
    out("rand") should be > 0.95
    out("rep") should be < 0.05
  }
}
