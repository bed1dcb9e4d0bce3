package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class EmbedAlgebraSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, -1.0f)),
    (2L, Array(2.0f, 0.0f, 3.0f)))
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("gram matches the naive upper-triangle computation") {
    val g = EmbedAlgebra.gram(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val naive = for { i <- 0 until 3; j <- i until 3 } yield
      (i, j) -> vecs.map { case (_, v) =>
        v(i).toDouble * v(j).toDouble }.sum
    naive.foreach { case (k, expected) =>
      g(k) shouldBe expected +- 1e-4
    }
    g.size shouldBe 6 // upper triangle only
  }

  test("pca recovers the dominant axis of anisotropic data") {
    // data stretched along (1, 1, 0)/sqrt(2), tiny noise elsewhere
    val pts = (0 until 200).map { t =>
      val s = (t % 21 - 10).toDouble // symmetric spread
      (t.toLong, Array((s + 0.01 * (t % 3)).toFloat,
        (s - 0.01 * (t % 5)).toFloat, (0.001 * (t % 7)).toFloat))
    }
    val out = EmbedAlgebra.pca(pts.toDF("vec_id", "embedding"), k = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(3)) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(4))).toMap
    val load0 = (0 until 3).map(p => out((0, p))._3)
    // first component ~ (1,1,0)/sqrt(2), sign-fixed positive
    load0(0) shouldBe (1 / math.sqrt(2)) +- 0.01
    load0(1) shouldBe (1 / math.sqrt(2)) +- 0.01
    math.abs(load0(2)) should be < 0.05
    // eigenvalues sorted descending, evr in (0, 1]
    out((0, 0))._1 should be >= out((1, 0))._1
    out((0, 0))._2 should (be > 0.9 and be <= 1.0)
  }

  test("pca components are orthonormal") {
    val pts = (0 until 60).map { t =>
      (t.toLong, Array.tabulate(4)(d =>
        (math.sin(t * (d + 1) * 0.37) * (d + 1)).toFloat))
    }
    val out = EmbedAlgebra.pca(pts.toDF("vec_id", "embedding"), k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(3)) -> r.getDouble(4)).toMap
    for (a <- 0 until 3; b <- a until 3) {
      val dot = (0 until 4).map(p => out((a, p)) * out((b, p))).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-3
    }
  }

  test("pca is deterministic across invocations (sign convention)") {
    val pts = (0 until 40).map { t =>
      (t.toLong, Array.tabulate(3)(d =>
        (math.cos(t * 0.91 + d) * (3 - d)).toFloat))
    }
    val a = EmbedAlgebra.pca(pts.toDF("vec_id", "embedding"), k = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = EmbedAlgebra.pca(pts.toDF("vec_id", "embedding"), k = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    a shouldBe b
  }

  test("randomProject matches the naive md5-sign computation") {
    val k = 4
    val out = EmbedAlgebra.randomProject(df, k, dim = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    vecs.foreach { case (id, v) =>
      (0 until k).foreach { j =>
        val expected = BigDecimal(
          (0 until 3).map(i =>
            v(i).toDouble * EmbedAlgebra.rpSign(i, j)).sum /
            math.sqrt(k.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        out((id, j)) shouldBe expected
      }
    }
  }

  test("rpSign is +-1, deterministic, and roughly balanced") {
    val signs = for (i <- 0 until 64; j <- 0 until 16)
      yield EmbedAlgebra.rpSign(i, j)
    all(signs) should (be(1.0) or be(-1.0))
    val plus = signs.count(_ == 1.0).toDouble / signs.size
    plus shouldBe 0.5 +- 0.1
    EmbedAlgebra.rpSign(3, 7) shouldBe EmbedAlgebra.rpSign(3, 7)
  }
}
