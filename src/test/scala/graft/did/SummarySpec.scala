package graft.did

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SummarySpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  private lazy val fit = {
    val pp = Preprocess.run(staggered(spark, nUnits = 150), cfg)
    AttGt.fit(pp, bstrap = true)
  }

  test("sumGt: bootstrap fit carries band columns; rows match cells") {
    val t = Summary.sumGt(fit)
    assert(t.columns.toSeq ==
      Seq("group", "time", "att", "se", "lower", "upper", "sig"))
    assert(t.count() == fit.cells.count(i => !fit.skipped(i.idx)))
  }

  test("sumGt: analytic fit drops band columns") {
    val pp = Preprocess.run(staggered(spark, nUnits = 150), cfg)
    val f2 = AttGt.fit(pp)
    assert(Summary.sumGt(f2).columns.toSeq ==
      Seq("group", "time", "att", "se"))
    f2.unpersist(); pp.unpersist()
  }

  test("plot frames and text banner render") {
    val prep = Aggte.prepare(fit)
    val r = Aggte.dynamic(prep)
    val pf = Summary.aggtePlotFrame(r)
    assert(pf.count() == r.egt.length)
    assert(Summary.attgtPlotFrame(fit).count() > 0)
    val txt = Summary.text(r)
    assert(txt.contains("Event-Study") && txt.contains("Overall ATT"))
  }
}
