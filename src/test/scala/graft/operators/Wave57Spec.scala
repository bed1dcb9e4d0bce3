package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 57: robust MAD outliers, seasonal MASE, FIM splits,
  * judge majority vote, win-rate matrices. */
class Wave57Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("madOutliers: one wild point flags, the tight mass does not") {
    // {10,10,11,11,12,100}: median 11, ads {1,1,0,0,1,89}, MAD 1
    val df = Seq(10.0, 10.0, 11.0, 11.0, 12.0, 100.0)
      .map(("g", _)).toDF("g", "x")
    val r = Stats.madOutliers(df, "g", "x").head()
    r.getLong(1) shouldBe 6L
    r.getDouble(2) shouldBe 11.0
    r.getDouble(3) shouldBe 1.0
    r.getLong(4) shouldBe 1L
  }

  test("madOutliers: degenerate MAD 0 flags any deviation") {
    val df = (Seq.fill(5)(7.0) :+ 7.1).map(("g", _)).toDF("g", "x")
    val r = Stats.madOutliers(df, "g", "x").head()
    r.getDouble(3) shouldBe 0.0
    r.getLong(4) shouldBe 1L
  }

  test("seasonalMase: a perfect period-5 signal reads mase 0; white " +
    "noise reads ~1+") {
    val periodic = (1 to 50).map(i => ("s", i.toLong,
      Seq(1.0, 5.0, 2.0, 8.0, 3.0)((i - 1) % 5)))
    val r = Stats.seasonalMase(periodic.toDF("st", "seq", "v"),
      "st", "seq", "v", season = 5).head()
    r.getDouble(3) shouldBe 0.0 // seasonal-naive MAE
    r.getDouble(4) shouldBe 0.0 // mase
    r.getDouble(2) should be > 1.0 // naive MAE is large
  }

  test("seasonalMase: duplicate seq trips the probe") {
    intercept[IllegalArgumentException] {
      Stats.seasonalMase(Seq(("s", 1L, 1.0), ("s", 1L, 2.0))
        .toDF("st", "seq", "v"), "st", "seq", "v")
    }.getMessage should include("nondeterministic")
  }

  test("fimSplit: spans partition the text exactly, 40/20/40") {
    val text = "a" * 10
    val r = Chunking.fimSplit(Seq((1L, text)).toDF("id", "text"),
      "id", "text").head()
    r.getLong(1) shouldBe 10L
    (r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe ((4L, 2L, 4L))
    // md5 of the actual spans
    r.getString(5) shouldBe java.security.MessageDigest
      .getInstance("MD5").digest("aaaa".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("fimSplit: lengths always sum to n_chars (odd lengths too)") {
    val df = Seq((1L, "abcdefg"), (2L, "xy"), (3L, ""))
      .toDF("id", "text")
    Chunking.fimSplit(df, "id", "text").collect().foreach { r =>
      r.getLong(2) + r.getLong(3) + r.getLong(4) shouldBe r.getLong(1)
    }
  }

  test("judgeMajority: majority, margin, tie-break to smallest " +
    "verdict, unanimity") {
    val votes = Seq((1L, "good"), (1L, "good"), (1L, "bad"),
      (2L, "ok"), (2L, "ok"),
      (3L, "bad"), (3L, "good")).toDF("item", "verdict")
    val r = Eval.judgeMajority(votes, "item", "verdict")
      .orderBy("item").collect()
    (r(0).getString(2), r(0).getLong(3), r(0).getBoolean(4)) shouldBe
      (("good", 1L, false))
    (r(1).getString(2), r(1).getLong(3), r(1).getBoolean(4)) shouldBe
      (("ok", 2L, true))
    // 1-1 tie breaks to 'bad' (lexicographically smallest), margin 0
    (r(2).getString(2), r(2).getLong(3)) shouldBe (("bad", 0L))
  }

  test("winrateMatrix: canonical pair, per-side wins, ties, rate") {
    val battles = Seq(
      ("m2", "m1", "a"), // m2 beats m1 -> hi wins
      ("m1", "m2", "a"), // m1 beats m2 -> lo wins
      ("m1", "m2", "tie"),
      ("m1", "m2", "b")) // m2 wins -> hi
      .toDF("a", "b", "w")
    val r = Eval.winrateMatrix(battles, "a", "b", "w").head()
    (r.getString(0), r.getString(1)) shouldBe (("m1", "m2"))
    (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) shouldBe
      ((4L, 1L, 2L, 1L))
    r.getDouble(6) shouldBe 0.333333 +- 1e-6
  }
}
