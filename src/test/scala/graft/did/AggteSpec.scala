package graft.did

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class NaRmSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  test("NaN cells: prepare raises without naRm, prunes with it") {
    val pp = Preprocess.run(staggered(spark, nUnits = 150), cfg)
    val fit = AttGt.fit(pp)
    val poisoned = fit.copy(att = fit.att.updated(0, Double.NaN))
    intercept[IllegalArgumentException] { Aggte.prepare(poisoned) }
    val p = Aggte.prepare(poisoned, naRm = true)
    assert(p.attCell.length == fit.cells.length - 1)
    assert(!p.attCell.exists(_.isNaN))
    // cell ids still address the IF table correctly
    val r = Aggte.simple(p)
    assert(!r.overallAtt.isNaN && !r.overallSe.isNaN)
    // group aggregation drops cohorts left without post cells
    val rg = Aggte.group(p)
    assert(rg.egt.nonEmpty && !rg.overallAtt.isNaN)
    fit.unpersist(); pp.unpersist()
  }
}

class AggteSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  private lazy val fit = {
    val pp = Preprocess.run(staggered(spark, nUnits = 400, noise = 0.05), cfg)
    AttGt.fit(pp, estMethod = "dr")
  }
  private lazy val prep = Aggte.prepare(fit)

  private def postCells: Seq[Int] =
    fit.cells.indices.filter(i => fit.cells(i).g <= fit.cells(i).tn)

  test("simple: overall ATT in convex hull of post-treatment cells") {
    val r = Aggte.simple(prep)
    val atts = postCells.map(fit.att)
    assert(r.overallAtt >= atts.min - 1e-9 && r.overallAtt <= atts.max + 1e-9)
    assert(r.overallSe > 0 && java.lang.Double.isFinite(r.overallSe))
    // DGP truth: simple is the pg-weighted mean over post-treatment
    // CELLS (not cohort means); equal cohort sizes -> plain mean of
    // tau = t-g+1 over the 9 post cells = (1+2+3+4 + 1+2+3 + 1+2)/9
    assert(math.abs(r.overallAtt - 19.0 / 9.0) < 0.1)
  }

  test("group: per-cohort means and pg-weighted overall") {
    val r = Aggte.group(prep)
    assert(r.egt == Seq(3.0, 4.0, 5.0))
    val expected = Map(3.0 -> 2.5, 4.0 -> 2.0, 5.0 -> 1.5)
    r.egt.zip(r.attEgt).foreach { case (g, a) =>
      assert(math.abs(a - expected(g)) < 0.1, s"cohort $g: $a")
    }
    assert(math.abs(r.overallAtt - 2.0) < 0.1)
    r.seEgt.foreach(se => assert(se > 0))
  }

  test("calendar: per-period means over treated cohorts") {
    val r = Aggte.calendar(prep)
    assert(r.egt == Seq(3.0, 4.0, 5.0, 6.0))
    // t=3: only cohort 3 treated, tau=1; t=4: cohorts 3,4 -> (2+1)/2=1.5;
    // t=5: (3+2+1)/3=2; t=6: (4+3+2)/3=3
    val expected = Map(3.0 -> 1.0, 4.0 -> 1.5, 5.0 -> 2.0, 6.0 -> 3.0)
    r.egt.zip(r.attEgt).foreach { case (t, a) =>
      assert(math.abs(a - expected(t)) < 0.1, s"period $t: $a")
    }
    assert(math.abs(r.overallAtt - expected.values.sum / 4) < 0.1)
  }

  test("dynamic (extension): per-event-time means") {
    val r = Aggte.dynamic(prep)
    // e>=0: tau = e+1 exactly for every cohort
    r.egt.zip(r.attEgt).foreach { case (e, a) =>
      if (e >= 0) assert(math.abs(a - (e + 1)) < 0.1, s"e=$e: $a")
      else assert(math.abs(a) < 0.1, s"placebo e=$e: $a")
    }
  }

  test("dynamic minE/maxE: trim is exactly a keep-filter on event times") {
    val full = Aggte.dynamic(prep)
    val win = Aggte.dynamic(prep, minE = -2, maxE = 1)
    assert(win.egt == full.egt.filter(e => e >= -2 && e <= 1))
    // per-e weights normalize within each event time, so trimmed event
    // times keep their full-grid point estimates bit-for-bit
    win.egt.zip(win.attEgt).foreach { case (e, a) =>
      assert(a == full.attEgt(full.egt.indexOf(e)), s"e=$e")
    }
    // overall recomputes over the post slice of the window only
    val postW = win.egt.zip(win.attEgt).filter(_._1 >= 0).map(_._2)
    assert(math.abs(win.overallAtt - postW.sum / postW.size) <= 1e-9)
  }

  test("dynamic balanceE: constant composition window, truth preserved") {
    // cohorts {3,4,5} over 6 periods: last event times 3/2/1. With
    // balanceE=2 only cohorts 3 and 4 qualify and e is clipped to <= 2.
    val r = Aggte.dynamic(prep, balanceE = Some(2.0))
    assert(r.egt.max == 2.0, s"egt=${r.egt}")
    r.egt.zip(r.attEgt).foreach { case (e, a) =>
      if (e >= 0) assert(math.abs(a - (e + 1)) < 0.1, s"e=$e: $a")
    }
    // unbalanced run reaches e=3 (cohort-3-only tail)
    assert(Aggte.dynamic(prep).egt.max == 3.0)
  }

  test("dynamic cband: simultaneous crit val >= pointwise z") {
    val r = Aggte.dynamic(prep, bstrap = Some(true), cband = Some(true))
    assert(r.critValEgt >= Stats.normPpf(1 - r.alp / 2))
    assert(r.critValEgt < 7.0)
  }

  test("crit-val clamps: NaN/inf/below-z -> pointwise, >= 7 kept + warned") {
    val z = Stats.normPpf(0.975)
    assert(Aggte.clampCritVal(Double.NaN, z) == z)
    assert(Aggte.clampCritVal(Double.PositiveInfinity, z) == z)
    assert(Aggte.clampCritVal(1.0, z) == z)
    assert(Aggte.clampCritVal(2.5, z) == 2.5)
    // >= 7 warns (csdids/ATTgt.py:737-740) but keeps the value
    val err = new java.io.ByteArrayOutputStream()
    val saved = System.err
    System.setErr(new java.io.PrintStream(err))
    try assert(Aggte.clampCritVal(8.0, z) == 8.0)
    finally System.setErr(saved)
    assert(err.toString.contains("too large"))
  }
}
