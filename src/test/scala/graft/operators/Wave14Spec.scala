package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-14: hand-computed fixtures for vocabCoverage,
  * mixEntropy, fanoFactor, and dowAnomaly. */
class Wave14Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("vocabCoverage: OOV mass against the (freq desc, tok) top-K") {
    // corpus freq: a=3, b=1, c=1 -> top-2 = {a, b} (tie b<c);
    // A="a a b" fully covered, B="a c" has c OOV -> rate 0.5
    val df = Seq(("A", "a a b"), ("B", "a c")).toDF("source", "text")
    val r = TextQuality.vocabCoverage(df, "source", "text", topK = 2)
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("oov_tokens"),
          x.getAs[Double]("oov_rate"))).toMap
    r("A") shouldBe ((3L, 0L, 0.0))
    r("B") shouldBe ((2L, 1L, 0.5))
  }

  test("mixEntropy: Shannon bits with dominant-category tie-break") {
    // s1: [en, en, fr] -> H = -(2/3 lg 2/3 + 1/3 lg 1/3) = 0.918296;
    // s2: [de] -> H = 0, top share 1
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "fr"),
      ("s2", "de")).toDF("source", "lang")
    val r = Profile.mixEntropy(df, "source", "lang")
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_rows"), x.getAs[Long]("n_cats"),
          x.getAs[Double]("entropy"), x.getAs[String]("top_cat"),
          x.getAs[Double]("top_share"))).toMap
    r("s1") shouldBe ((3L, 2L, 0.918296, "en", 0.666667))
    r("s2") shouldBe ((1L, 1L, 0.0, "de", 1.0))
  }

  test("fanoFactor: Poisson=1 reference, constant=0, spiky>1") {
    // c: [2,2,2] -> var 0 -> fano 0; s: [0,4] -> mean 2, var 4 -> 2
    val df = Seq(("c", 2L), ("c", 2L), ("c", 2L), ("s", 0L), ("s", 4L))
      .toDF("g", "x")
    val r = Stats.fanoFactor(df, "g", "x")
      .collect().map(x => x.getAs[String]("g") ->
        (x.getAs[Double]("mean"), x.getAs[Double]("fano"),
          x.getAs[Boolean]("bursty"))).toMap
    r("c") shouldBe ((2.0, 0.0, false))
    r("s") shouldBe ((2.0, 2.0, true))
  }

  test("dowAnomaly: z against the same-dow baseline only") {
    // type X on three Mondays (epoch days 4, 11, 18) with volumes
    // 1, 1, 4: baseline mean 2, var 2 -> z = -0.707107, -0.707107,
    // +1.414214; threshold 1.0 flags only the spike day
    val day = 86400000L
    def ev(d: Long, k: Int) =
      (0 until k).map(i => ("X", new Timestamp(d * day + i * 1000L)))
    val df = (ev(4L, 1) ++ ev(11L, 1) ++ ev(18L, 4))
      .toDF("event_type", "ts")
    val r = Events.dowAnomaly(df, zThreshold = 1.0)
      .collect().map(x => x.getAs[Long]("day") ->
        (x.getAs[Int]("dow"), x.getAs[Long]("n"),
          x.getAs[Double]("z"), x.getAs[Boolean]("is_anomaly"))).toMap
    r(4L) shouldBe ((0, 1L, -0.707107, false))
    r(11L) shouldBe ((0, 1L, -0.707107, false))
    r(18L) shouldBe ((0, 4L, 1.414214, true))
  }
}
