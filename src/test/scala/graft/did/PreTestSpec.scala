package graft.did

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import breeze.linalg.{inv, DenseMatrix, DenseVector}

/** Pins the distributed ATT(g,t) covariance matrix and the pre-trend
  * Wald test: diagonal == analytic SE^2, dense driver replay parity,
  * outcome-scale invariance, and power against an injected pre-trend.
  * The matrix itself is additionally DuckDB-oracle-checked end to end
  * (`q_att_gt_vcov`); the Wald solve is driver-side breeze and not
  * SQL-expressible, hence spec-pinned here. */
class PreTestSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  private lazy val fit = {
    val pp = Preprocess.run(staggered(spark, nUnits = 200, noise = 0.1), cfg)
    AttGt.fit(pp, estMethod = "dr")
  }

  private def covMap(f: AttGtFit): Map[(Int, Int), Double] =
    PreTest.vcov(f).collect().map { r =>
      ((r.get(0).asInstanceOf[Number].intValue,
        r.get(1).asInstanceOf[Number].intValue), r.getDouble(2))
    }.toMap

  test("vcov: diagonal equals the analytic SE squared") {
    val v = covMap(fit)
    val live = fit.cells.filterNot(c => c.zeroCell || fit.skipped(c.idx))
    assert(live.nonEmpty)
    live.foreach { c =>
      val se2 = fit.seAnalytic(c.idx) * fit.seAnalytic(c.idx)
      assert(math.abs(v((c.idx, c.idx)) - se2) <=
        1e-8 * math.max(1.0, se2), s"cell ${c.idx}")
    }
  }

  test("wald: distributed path matches a dense driver replay to 1e-8") {
    val r = PreTest.wald(fit)
    assert(r.w >= 0 && r.pval >= 0 && r.pval <= 1)
    val pre = fit.cells
      .filter(c => !c.zeroCell && !fit.skipped(c.idx) && c.tn < c.g)
    assert(r.df == pre.length, "no degenerate pre cells in this DGP")

    // dense replay: collect the sparse IF store, build V at the driver
    val n = fit.pp.n.toDouble
    val byCell = fit.ifTable.collect()
      .map(x => (x.getString(0), x.get(1).asInstanceOf[Number].intValue,
        x.getDouble(2)))
      .groupBy(_._2)
      .map { case (c, xs) => c -> xs.map(x => x._1 -> x._3).toMap }
    val idx = pre.map(_.idx)
    val k = idx.length
    val v = DenseMatrix.tabulate[Double](k, k) { (i, j) =>
      val a = byCell(idx(i)); val b = byCell(idx(j))
      val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
      small.iterator.map { case (u, x) => x * big.getOrElse(u, 0.0) }.sum /
        (n * n)
    }
    val att = DenseVector(idx.map(fit.att).toArray)
    val wDense = att dot (inv(v) * att)
    assert(math.abs(wDense - r.w) <= 1e-8 * math.max(1.0, wDense),
      s"dense $wDense vs distributed ${r.w}")
  }

  test("wald: invariant to rescaling the outcome") {
    val scaled = staggered(spark, nUnits = 200, noise = 0.1)
      .withColumn("y", col("y") * 3.0)
    val pp2 = Preprocess.run(scaled, cfg)
    val f2 = AttGt.fit(pp2, estMethod = "dr")
    val r2 = PreTest.wald(f2)
    val r1 = PreTest.wald(fit)
    assert(math.abs(r2.w - r1.w) <= 1e-6 * math.max(1.0, r1.w),
      s"${r2.w} vs ${r1.w}")
    f2.unpersist(); pp2.unpersist()
  }

  test("wald: rejects an injected differential pre-trend") {
    // treated cohorts get a steeper slope in EVERY period, so the
    // pre-treatment ATT(g,t) are nonzero and H0 must be rejected
    val trended = staggered(spark, nUnits = 200, noise = 0.1)
      .withColumn("y",
        col("y") + org.apache.spark.sql.functions
          .when(col("g") > 0, col("period") * 0.5).otherwise(0.0))
    val pp2 = Preprocess.run(trended, cfg)
    val f2 = AttGt.fit(pp2, estMethod = "dr")
    val r2 = PreTest.wald(f2)
    assert(r2.pval < 1e-3, s"pre-trend not detected: pval=${r2.pval}")
    f2.unpersist(); pp2.unpersist()
  }
}
