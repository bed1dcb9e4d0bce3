package graft.did

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PreprocessSpec extends AnyFunSuite with SparkSpec {
  import TestPanels._

  test("basic preprocess: lists, counts, regime downgrade") {
    val df = staggered(spark, nUnits = 40)
    val pp = Preprocess.run(df, cfg)
    assert(pp.tlist == Vector(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(pp.glist == Vector(3.0, 4.0, 5.0))
    assert(pp.n == 40)
    // default panel+allowUnbalanced downgrades to the rc code path
    // (csdids/ATTgt.py:162-166)
    assert(!pp.panel && !pp.trueRepCrossSection)
    pp.unpersist()
  }

  // 6 units per cohort so the small-group guard (count/nT >= nCov+5,
  // csdids/ATTgt.py:199-216) passes on tiny fixtures.
  private def sixOf(gv: Int, idBase: Int): Seq[Obs] =
    (0 until 6).flatMap(i => Seq(
      Obs(idBase + i, 1, 1.0, gv, 0, 0, 1), Obs(idBase + i, 2, 2.0, gv, 0, 0, 1)))

  test("periods seen only on missing-cohort rows still enter tlist") {
    import spark.implicits._
    // period 3 exists ONLY on rows whose cohort is missing; it must
    // still be in tlist and push maxT to 3, so cohort g=3 stays a real
    // cohort instead of being recoded to never-treated
    // 9 units per cohort: with period 3 only on the null-cohort rows,
    // nT = 3 makes the small-group guard bound count/3 >= 5
    val nineOf = (gv: Int, idBase: Int) => (0 until 9).flatMap(i => Seq(
      Obs(idBase + i, 1, 1.0, gv, 0, 0, 1),
      Obs(idBase + i, 2, 2.0, gv, 0, 0, 1)))
    val base = (nineOf(3, 1) ++ nineOf(0, 21)).toDF()
    val nullG = (0 until 6)
      .map(i => (40 + i, 3, 3.0, Option.empty[Int], 0.0, 0.0, 1.0))
      .toDF("id", "period", "y", "g", "x1", "x2", "wgt")
    val pp = Preprocess.run(base.unionByName(nullG), cfg)
    assert(pp.tlist == Vector(1.0, 2.0, 3.0))
    assert(pp.glist == Vector(3.0))
    pp.unpersist()
  }

  test("cohorts beyond max(t) are recoded to never-treated") {
    import spark.implicits._
    val df = (sixOf(9, 1) ++ sixOf(2, 11) ++ sixOf(0, 21)).toDF() // g=9 > max t=2
    val pp = Preprocess.run(df, cfg)
    assert(pp.glist == Vector(2.0)) // 9 recoded to 0, not a cohort
    assert(pp.df.filter(org.apache.spark.sql.functions.col("gg") === 9.0).count() == 0)
    pp.unpersist()
  }

  test("units already treated at the first period are dropped") {
    import spark.implicits._
    val df = (sixOf(1, 1) ++ sixOf(2, 11) ++ sixOf(0, 21)).toDF() // g=1 = first period
    val pp = Preprocess.run(df, cfg)
    assert(pp.n == 12)
    assert(pp.glist == Vector(2.0))
    pp.unpersist()
  }

  test("no never-treated + nevertreated control raises; notyettreated trims") {
    import spark.implicits._
    val df = Seq(
      Obs(1, 1, 1.0, 2, 0, 0, 1), Obs(1, 2, 2.0, 2, 0, 0, 1),
      Obs(1, 3, 2.0, 2, 0, 0, 1),
      Obs(2, 1, 1.0, 3, 0, 0, 1), Obs(2, 2, 2.0, 3, 0, 0, 1),
      Obs(2, 3, 2.0, 3, 0, 0, 1)
    ).toDF()
    assertThrows[IllegalArgumentException](Preprocess.run(df, cfg))
    val pp = Preprocess.run(df, cfg.copy(controlGroup = "notyettreated"))
    // periods >= max cohort (3) trimmed; cohort 3 no longer usable
    assert(pp.tlist == Vector(1.0, 2.0))
    assert(pp.glist == Vector(2.0))
    pp.unpersist()
  }
}
