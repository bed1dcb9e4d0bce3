package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-19: chiSquareIndependence (including the zero-cell
  * identity) and fdViolations. */
class Wave19Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("chiSquare: uniform 2x2 is independent (chi2 = 0)") {
    val df = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(10)(("a2", "b2")))
      .toDF("a", "b")
    val r = Stats.chiSquareIndependence(df, "a", "b").collect().head
    r.getAs[Long]("n") shouldBe 40L
    r.getAs[Long]("dof") shouldBe 1L
    r.getAs[Double]("chi2") shouldBe 0.0
    r.getAs[Double]("cramers_v") shouldBe 0.0
  }

  test("chiSquare: diagonal table maxes V, zero cells via +N identity") {
    // only (a1,b1) and (a2,b2) observed: full-table chi2 = 20 with the
    // two ZERO cells contributing e=5 each — the Σe identity must
    // recover them from the observed frame alone
    val df = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a2", "b2")))
      .toDF("a", "b")
    val r = Stats.chiSquareIndependence(df, "a", "b").collect().head
    r.getAs[Long]("n") shouldBe 20L
    r.getAs[Long]("dof") shouldBe 1L
    r.getAs[Double]("chi2") shouldBe 20.0
    r.getAs[Double]("cramers_v") shouldBe 1.0
  }

  test("fdViolations: modal counts, conflicting rows, rate") {
    // k1 -> {x,x,y} violates (1 conflicting row); k2 -> {z,z} holds
    val df = Seq(("k1", "x"), ("k1", "x"), ("k1", "y"),
      ("k2", "z"), ("k2", "z")).toDF("l", "r")
    val s = Stats.fdViolations(df, "l", "r").collect().head
    s.getAs[Long]("n_keys") shouldBe 2L
    s.getAs[Long]("violating_keys") shouldBe 1L
    s.getAs[Long]("n_rows") shouldBe 5L
    s.getAs[Long]("conflicting_rows") shouldBe 1L
    s.getAs[Boolean]("fd_holds") shouldBe false
    s.getAs[Double]("violation_rate") shouldBe 0.2
  }

  test("cluster purity: separable clusters recover their labels exactly") {
    // even ids hug the origin (label 0), odd ids hug 10 (label 1);
    // k-means inits on vec_ids 0 and 1 — one per true cluster — so
    // the per-cluster label mix is pure: entropy 0, top_share 1
    val vecs = (0 until 8).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array.fill(4)(base + 0.01f * i), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val assign = Similarity.kmeansAssignExact(vecs, "vec_id",
      "embedding", k = 2, iters = 2)
    val purity = Profile.mixEntropy(
        assign.join(vecs.select("vec_id", "label"), "vec_id"),
        "cluster", "label")
      .collect()
    purity.length shouldBe 2
    purity.foreach { r =>
      r.getAs[Long]("n_rows") shouldBe 4L
      r.getAs[Long]("n_cats") shouldBe 1L
      r.getAs[Double]("entropy") shouldBe 0.0
      r.getAs[Double]("top_share") shouldBe 1.0
    }
  }
}
