package graft.did

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Estimator invariance properties (SURVEY.md §5.3): the ATT surface
  * must be equivariant under affine outcome transforms and invariant
  * under unit relabeling, row order, and weight rescaling (the last is
  * covered in AttGtSpec). */
class PropertiesSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  private def surface(df: org.apache.spark.sql.DataFrame,
      cfgV: AttGtConfig = cfg): Map[(Double, Double), Double] = {
    val pp = Preprocess.run(df, cfgV)
    val fit = AttGt.fit(pp)
    val m = fit.cells.indices.map(i =>
      (fit.cells(i).g, fit.cells(i).tn) -> fit.att(i)).toMap
    fit.unpersist(); pp.unpersist()
    m
  }

  private lazy val base = staggered(spark, nUnits = 150).cache()

  test("affine equivariance: Y -> aY + b  =>  ATT -> a*ATT") {
    val a = 3.5; val b = -11.0
    val s0 = surface(base)
    val s1 = surface(base.withColumn("y", col("y") * a + b))
    s0.foreach { case (k, v) =>
      assert(math.abs(s1(k) - a * v) < 1e-9, s"cell $k: ${s1(k)} vs ${a * v}")
    }
  }

  test("unit relabeling invariance: id -> 7919*id + 13") {
    val s0 = surface(base)
    val s1 = surface(base.withColumn("id", col("id") * 7919 + 13))
    s0.foreach { case (k, v) => assert(math.abs(s1(k) - v) < 1e-9) }
  }

  test("row order invariance: shuffled input gives the same surface") {
    val s0 = surface(base)
    val s1 = surface(base.orderBy(hash(col("id"), col("period"))))
    s0.foreach { case (k, v) => assert(math.abs(s1(k) - v) < 1e-9) }
  }

  test("simple aggregate lies in the hull of post-treatment cells") {
    val pp = Preprocess.run(base, cfg)
    val fit = AttGt.fit(pp)
    val p = Aggte.prepare(fit)
    val post = p.group.indices.filter(i => p.group(i) <= p.t(i)).map(p.att)
    val r = Aggte.simple(p)
    assert(r.overallAtt >= post.min - 1e-12 && r.overallAtt <= post.max + 1e-12)
    fit.unpersist(); pp.unpersist()
  }
}
