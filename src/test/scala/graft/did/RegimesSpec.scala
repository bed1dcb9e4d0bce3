package graft.did

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parameter-surface coverage beyond the default regime (FIXTURES.md
  * §1.3): anticipation, true repeated cross-sections, clustered
  * bootstrap, and the est_method callable extension point. */
class RegimesSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  test("anticipation=1 shifts the base period and drops early cohorts") {
    val pp = Preprocess.run(staggered(spark, nUnits = 400, noise = 0.05),
      cfg.copy(anticipation = 1))
    // glist: g > firstPeriod + anticipation = 2
    assert(pp.glist.forall(_ > 2.0))
    val fit = AttGt.fit(pp, estMethod = "dr")
    fit.cells.indices.foreach { i =>
      val c = fit.cells(i)
      // base period satisfies tpre + anticipation < g
      assert(c.tpre + 1 < c.g || c.g > c.tn,
        s"cell (g=${c.g}, t=${c.tn}) base ${c.tpre}")
      // DGP has no anticipation effect, so truth is unchanged
      val truth = if (c.g <= c.tn) c.tn - c.g + 1.0 else 0.0
      if (c.g <= c.tn)
        assert(math.abs(fit.att(i) - truth) < 0.05,
          s"cell (g=${c.g}, t=${c.tn}): ${fit.att(i)} vs $truth")
    }
    fit.unpersist(); pp.unpersist()
  }

  test("true repeated cross-section regime (panel=false) recovers truth") {
    val pp = Preprocess.run(staggered(spark, nUnits = 500, noise = 0.05),
      cfg.copy(panel = false))
    assert(pp.trueRepCrossSection && !pp.panel)
    // every observation is its own unit
    assert(pp.n == 500L * 6)
    val fit = AttGt.fit(pp, estMethod = "dr")
    fit.cells.indices.foreach { i =>
      val c = fit.cells(i)
      val truth = if (c.g <= c.tn) c.tn - c.g + 1.0 else 0.0
      // unit fixed effects are noise here (no differencing within unit),
      // so the tolerance is looser than the panel tests
      assert(math.abs(fit.att(i) - truth) < 0.4,
        s"cell (g=${c.g}, t=${c.tn}): ${fit.att(i)} vs $truth")
    }
    fit.unpersist(); pp.unpersist()
  }

  test("clustered bootstrap: cluster-mean IF, finite SEs") {
    val pp = Preprocess.run(staggered(spark, nUnits = 200, noise = 0.1), cfg)
    val fit = AttGt.fit(pp, estMethod = "dr")
    val spark2 = spark
    import spark2.implicits._
    // 10 clusters of units (unit id mod 10)
    val clusters = fit.ifTable.select("rowid").distinct()
      .withColumn("cluster", pmod(col("rowid").cast("long"), lit(10)))
    val r = MBoot.runClustered(fit.ifTable, clusters, fit.cells.length,
      biters = 499, alp = 0.05, seed = 11L)
    val finite = r.se.filter(s => !s.isNaN)
    assert(finite.nonEmpty)
    finite.foreach(s => assert(s > 0 && java.lang.Double.isFinite(s)))
    assert(r.critVal >= Stats.normPpf(0.9) || r.critVal.isNaN)
    fit.unpersist(); pp.unpersist()
  }

  test("config.clustervar routes fit's bootstrap to the clustered path") {
    val panel = staggered(spark, nUnits = 200, noise = 0.1)
      .withColumn("clust", pmod(col("id"), lit(10)))
    val ccfg = cfg.copy(clustervar = Some("clust"), biters = 199)
    val pp = Preprocess.run(panel, ccfg)
    val fit = AttGt.fit(pp, estMethod = "dr", bstrap = true)
    // ground truth: the same clustered bootstrap invoked directly
    val clusters = pp.df
      .select(col("rowid").cast("string").as("rowid"),
        col("clust").cast("string").as("cluster"))
      .distinct()
    val direct = MBoot.runClustered(fit.ifTable, clusters, fit.cells.length,
      biters = 199, alp = ccfg.alp, seed = ccfg.seed)
    fit.se.indices.foreach { i =>
      // last-ulp tolerance: the per-cluster IF sums aggregate in
      // different partition orders across the two invocations
      assert((fit.se(i).isNaN && direct.se(i).isNaN) ||
        math.abs(fit.se(i) - direct.se(i)) <= 1e-12 * math.abs(direct.se(i)),
        s"cell $i: ${fit.se(i)} vs ${direct.se(i)}")
    }
    // and it differs from the unclustered bootstrap (clustering is live)
    val unclust = MBoot.run(fit.ifTable, fit.cells.length, pp.n,
      biters = 199, alp = ccfg.alp, seed = ccfg.seed)
    assert(fit.se.indices.exists(i =>
      !fit.se(i).isNaN && !unclust.se(i).isNaN &&
        math.abs(fit.se(i) - unclust.se(i)) > 1e-12))
    fit.unpersist(); pp.unpersist()
  }

  test("time-varying clustervar is rejected loudly") {
    val panel = staggered(spark, nUnits = 60, noise = 0.1)
      .withColumn("clust", pmod(col("period"), lit(2)))
    val pp = Preprocess.run(panel,
      cfg.copy(clustervar = Some("clust"), biters = 49))
    val e = intercept[IllegalArgumentException] {
      AttGt.fit(pp, bstrap = true)
    }
    assert(e.getMessage.contains("time-varying cluster"))
    pp.unpersist()
  }

  test("clustervar == idname degrades to the unclustered bootstrap") {
    val pp = Preprocess.run(staggered(spark, nUnits = 100, noise = 0.1),
      cfg.copy(clustervar = Some("id"), biters = 99))
    val fit = AttGt.fit(pp, bstrap = true)
    val plain = MBoot.run(fit.ifTable, fit.cells.length, pp.n,
      biters = 99, alp = cfg.alp, seed = cfg.seed)
    fit.se.indices.foreach { i =>
      assert(fit.se(i) == plain.se(i) ||
        (fit.se(i).isNaN && plain.se(i).isNaN))
    }
    fit.unpersist(); pp.unpersist()
  }

  test("ipw: intercept-only distributed form equals the collected IpwDidRc") {
    val pp = Preprocess.run(staggered(spark, nUnits = 150), cfg)
    val dist = AttGt.fit(pp, estMethod = "ipw")
    val coll = AttGt.fit(pp, estMethod = "ipw",
      customRc = Some(CellEstimators.IpwDidRc))
    dist.att.indices.foreach { i =>
      assert(math.abs(dist.att(i) - coll.att(i)) < 1e-8)
      assert(math.abs(dist.seAnalytic(i) - coll.seAnalytic(i)) < 1e-8,
        s"se cell $i: ${dist.seAnalytic(i)} vs ${coll.seAnalytic(i)}")
    }
    dist.unpersist(); coll.unpersist(); pp.unpersist()
  }

  test("ipw with covariates recovers DGP truth (rc and panel paths)") {
    val data = staggered(spark, nUnits = 300, noise = 0.05)
    for (balanced <- Seq(false, true)) {
      val pp = Preprocess.run(data,
        cfg.copy(xfmla = Some("y ~ x1 + x2"),
          allowUnbalancedPanel = !balanced))
      val fit = AttGt.fit(pp, estMethod = "ipw")
      fit.cells.indices.foreach { i =>
        val c = fit.cells(i)
        val truth = if (c.g <= c.tn) c.tn - c.g + 1.0 else 0.0
        assert(math.abs(fit.att(i) - truth) < 0.08,
          s"balanced=$balanced cell (g=${c.g}, t=${c.tn}): ${fit.att(i)} vs $truth")
        if (!fit.skipped(i))
          assert(fit.seAnalytic(i) > 0 &&
            java.lang.Double.isFinite(fit.seAnalytic(i)))
      }
      fit.unpersist(); pp.unpersist()
    }
  }

  test("custom estimators are regime-checked; customPanel drives the panel surface") {
    val data = staggered(spark, nUnits = 120)
    val ppP = Preprocess.run(data, cfg.copy(allowUnbalancedPanel = false))
    assert(ppP.panel)
    // an rc estimator in the panel regime is rejected, not silently
    // swapped for the built-in
    val e1 = intercept[IllegalArgumentException] {
      AttGt.fit(ppP, customRc = Some(CellEstimators.DrDidRc))
    }
    assert(e1.getMessage.contains("balanced-panel regime"))
    // and vice versa
    val ppRc = Preprocess.run(data, cfg)
    val e2 = intercept[IllegalArgumentException] {
      AttGt.fit(ppRc, customPanel = Some(CellEstimators.DrDidPanel))
    }
    assert(e2.getMessage.contains("repeated-cross-section regime"))
    // a custom panel estimator actually drives the results: unweighted
    // diff-in-means of Δy == dr intercept-only on the all-1-weight panel
    val custom = new PanelCellEstimator {
      def estimate(cell: PanelCell): (Double, Array[Double]) = {
        val dy = cell.yPost.indices.map(i => cell.yPost(i) - cell.yPre(i))
        val t = dy.indices.filter(i => cell.d(i) == 1.0)
        val c = dy.indices.filter(i => cell.d(i) == 0.0)
        (t.map(dy).sum / t.size - c.map(dy).sum / c.size,
          Array.fill(dy.length)(0.0))
      }
    }
    val fit = AttGt.fit(ppP, customPanel = Some(custom))
    val ref = AttGt.fit(ppP, estMethod = "dr")
    fit.att.indices.foreach { i =>
      if (!fit.skipped(i) && !ref.skipped(i))
        assert(math.abs(fit.att(i) - ref.att(i)) < 1e-8,
          s"cell $i: ${fit.att(i)} vs ${ref.att(i)}")
    }
    fit.unpersist(); ref.unpersist(); ppP.unpersist(); ppRc.unpersist()
  }

  test("est_method callable: custom estimator drives the surface") {
    val pp = Preprocess.run(staggered(spark, nUnits = 120), cfg)
    // difference-in-means estimator with zero influence (degenerate SEs)
    val custom = new RcCellEstimator {
      def estimate(cell: RcCell): (Double, Array[Double]) = {
        def m(d: Double, p: Double): Double = {
          val sel = cell.y.indices.filter(i =>
            cell.d(i) == d && cell.post(i) == p)
          sel.map(cell.y).sum / sel.size
        }
        ((m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0)),
          Array.fill(cell.y.length)(0.0))
      }
    }
    val fit = AttGt.fit(pp, customRc = Some(custom))
    val ref = AttGt.fit(pp, estMethod = "dr")
    fit.att.indices.foreach { i =>
      if (!fit.skipped(i) && !ref.skipped(i))
        assert(math.abs(fit.att(i) - ref.att(i)) < 1e-8,
          s"cell $i: ${fit.att(i)} vs ${ref.att(i)}")
    }
    fit.unpersist(); ref.unpersist(); pp.unpersist()
  }
}
