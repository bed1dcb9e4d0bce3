package graft.did

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The distributed covariate path must reproduce the collect-path
  * estimators (Breeze on raw arrays) exactly: same ATT, same analytic
  * SEs, cell by cell. `customRc` forces the collect path. */
class DistributedRcSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  private lazy val pp = Preprocess.run(
    staggered(spark, nUnits = 200, noise = 0.1),
    cfg.copy(xfmla = Some("y ~ x1 + x2")))

  for (m <- Seq("dr", "reg", "ipw")) {
    test(s"$m with covariates: distributed == collected to 1e-8") {
      val est = m match {
        case "dr" => CellEstimators.DrDidRc
        case "reg" => CellEstimators.RegDidRc
        case _ => CellEstimators.IpwDidRc
      }
      val dist = AttGt.fit(pp, estMethod = m)
      val coll = AttGt.fit(pp, estMethod = m, customRc = Some(est))
      dist.att.indices.foreach { i =>
        assert(dist.skipped(i) == coll.skipped(i), s"skip mismatch cell $i")
        if (!dist.skipped(i)) {
          assert(math.abs(dist.att(i) - coll.att(i)) < 1e-8,
            s"$m att cell $i: ${dist.att(i)} vs ${coll.att(i)}")
          assert(math.abs(dist.seAnalytic(i) - coll.seAnalytic(i)) < 1e-8,
            s"$m se cell $i: ${dist.seAnalytic(i)} vs ${coll.seAnalytic(i)}")
        }
      }
      dist.unpersist(); coll.unpersist()
    }
  }

  for (m <- Seq("dr", "reg", "ipw")) {
    test(s"balanced panel, $m with covariates: distributed == collected") {
      val ppP = Preprocess.run(staggered(spark, nUnits = 200, noise = 0.1),
        cfg.copy(xfmla = Some("y ~ x1 + x2"), allowUnbalancedPanel = false))
      assert(ppP.panel)
      val dist = AttGt.fit(ppP, estMethod = m)
      // the matching customPanel estimator forces the collect path
      val estP = m match {
        case "dr" => CellEstimators.DrDidPanel
        case "reg" => CellEstimators.RegDidPanel
        case _ => CellEstimators.IpwDidPanel
      }
      val coll = AttGt.fit(ppP, estMethod = m, customPanel = Some(estP))
      dist.att.indices.foreach { i =>
        assert(dist.skipped(i) == coll.skipped(i))
        if (!dist.skipped(i)) {
          assert(math.abs(dist.att(i) - coll.att(i)) < 1e-8,
            s"$m att cell $i: ${dist.att(i)} vs ${coll.att(i)}")
          assert(math.abs(dist.seAnalytic(i) - coll.seAnalytic(i)) < 1e-8,
            s"$m se cell $i: ${dist.seAnalytic(i)} vs ${coll.seAnalytic(i)}")
        }
      }
      dist.unpersist(); coll.unpersist(); ppP.unpersist()
    }
  }

  test("balanced-panel IF table is a projection: unique (rowid, cell)") {
    // DistributedPanel skips the groupBy(rowid, cell) on the strength
    // of panelWide's pivot (one row per unit per cell); a duplicate
    // would silently break sum(inf^2) analytic SEs. (The RC regime is
    // the opposite: rowid := unit id there, a unit's pre+post rows MUST
    // aggregate — its groupBy stays.)
    val ppP = Preprocess.run(staggered(spark, nUnits = 150, noise = 0.1),
      cfg.copy(xfmla = Some("y ~ x1 + x2"), allowUnbalancedPanel = false))
    val fit = AttGt.fit(ppP)
    val dups = fit.ifTable.groupBy("rowid", "cell")
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .count()
    assert(dups == 0L, s"$dups duplicate (rowid, cell) IF entries")
    fit.unpersist(); ppP.unpersist()
  }

  test("driver-collect guard trips BEFORE collect with a byte estimate") {
    val ex = intercept[IllegalArgumentException] {
      AttGt.fit(pp, estMethod = "dr",
        customRc = Some(CellEstimators.DrDidRc), maxDriverCellRows = 10)
    }
    assert(ex.getMessage.contains("MiB"), ex.getMessage)
    assert(ex.getMessage.contains("maxDriverCellRows"), ex.getMessage)
  }

  test("weighted run: distributed == collected with sampling weights") {
    val ppW = Preprocess.run(staggered(spark, nUnits = 200, noise = 0.1),
      cfg.copy(xfmla = Some("y ~ x1"), weightsName = Some("wgt")))
    val dist = AttGt.fit(ppW, estMethod = "dr")
    val coll = AttGt.fit(ppW, estMethod = "dr",
      customRc = Some(CellEstimators.DrDidRc))
    dist.att.indices.foreach { i =>
      if (!dist.skipped(i)) {
        assert(math.abs(dist.att(i) - coll.att(i)) < 1e-8)
        assert(math.abs(dist.seAnalytic(i) - coll.seAnalytic(i)) < 1e-8)
      }
    }
    dist.unpersist(); coll.unpersist(); ppW.unpersist()
  }
}
