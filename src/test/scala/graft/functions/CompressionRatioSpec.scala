package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class CompressionRatioSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ratioOf(s: String): Option[Double] = {
    val r = Seq(s).toDF("t")
      .select(CompressionRatioExpr.compressionRatio($"t")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("repetitive text compresses far below varied text") {
    val rep = "spam " * 400
    val varied = (0 until 400)
      .map(i => s"w${i * 2654435761L % 99991}").mkString(" ")
    val (r1, r2) = (ratioOf(rep).get, ratioOf(varied).get)
    r1 should be < 0.05
    r2 should be > 0.3
    r1 should be < r2 / 5
  }

  test("ratio is positive and bounded for ordinary prose") {
    val r = ratioOf("the quick brown fox jumps over the lazy dog " * 5).get
    r should (be > 0.0 and be < 1.2) // tiny docs can exceed 1 slightly
  }

  test("empty and null inputs yield null") {
    ratioOf("") shouldBe None
    Seq[String](null).toDF("t")
      .select(CompressionRatioExpr.compressionRatio($"t"))
      .head().isNullAt(0) shouldBe true
  }

  test("deterministic across invocations and rows") {
    val s = "alpha beta gamma delta " * 37
    ratioOf(s) shouldBe ratioOf(s)
    val two = Seq(s, s).toDF("t")
      .select(CompressionRatioExpr.compressionRatio($"t"))
      .as[Double].collect()
    two(0) shouldBe two(1)
  }

  test("matches a direct java.util.zip computation (fixed vector)") {
    val s = "to be or not to be that is the question " * 10
    val bytes = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    d.end()
    val expected = BigDecimal(out.toDouble / bytes.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ratioOf(s).get shouldBe expected
  }
}
