package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: robust statistics (MAD, trimmed mean). */
class Wave43Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("madByGroup: disc medians of value and absolute deviation") {
    // g=a: values 1..5 -> median 3, |dev| = 2,1,0,1,2 -> mad 1
    // g=b: 10, 10, 100 -> median 10, devs 0,0,90 -> mad 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 5.0), ("b", 10.0), ("b", 10.0), ("b", 100.0))
      .toDF("g", "v")
    val out = Profile.madByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    out("a") shouldBe ((5L, 3.0, 1.0))
    out("b") shouldBe ((3L, 10.0, 0.0))
  }

  test("trimmedMean: disc band cuts, integral cent mean") {
    // 10 values 1.00..10.00: disc p10 = 1.00, p90 = 9.00 ->
    // keep 1..9 -> mean 5.00
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("g", "v")
    val r = Profile.trimmedMean(df, "g", "v", scale = 100L)
      .collect().head
    (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) shouldBe
      ((9L, 1.0, 9.0, 5.0))
  }
}
