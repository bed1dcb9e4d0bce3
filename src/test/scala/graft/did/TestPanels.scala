package graft.did

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** Deterministic synthetic staggered-DiD panels (FIXTURES.md §1.3/§4).
  *
  * DGP (parallel trends by construction, like the reference's `5g10t`
  * simulation family): y_it = a_i + b·t + τ·(t−g+1)·1{g>0, t≥g} + ε_it.
  * True ATT(g,t) = τ·(t−g+1) for post cells, 0 for pre cells.
  */
object TestPanels {

  final case class Obs(id: Int, period: Int, y: Double, g: Int,
      x1: Double, x2: Double, wgt: Double)

  def staggered(
      spark: SparkSession,
      nUnits: Int = 300,
      nPeriods: Int = 6,
      cohorts: Seq[Int] = Seq(0, 3, 4, 5),
      effect: Double = 1.0,
      noise: Double = 0.1,
      seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val rng = new Random(seed)
    val rows = (0 until nUnits).flatMap { i =>
      val g = cohorts(i % cohorts.length)
      val fe = rng.nextGaussian()
      val x1 = rng.nextGaussian()
      val x2 = rng.nextGaussian()
      val w = 0.5 + rng.nextDouble()
      (1 to nPeriods).map { t =>
        val tau = if (g > 0 && t >= g) effect * (t - g + 1) else 0.0
        val y = fe + 0.5 * t + tau + noise * rng.nextGaussian()
        Obs(i, t, y, g, x1, x2, w)
      }
    }
    rows.toDF()
  }

  val cfg: AttGtConfig = AttGtConfig(
    yname = "y", tname = "period", idname = "id", gname = "g")

  /** Hand-computable 2x2: ATT = (4 − 1.5) − (1 − 0.5) = 2.0.
    * Six units per cohort so the small-group guard (count/nT >= nCov+5,
    * `csdids/ATTgt.py:199-216`) passes. */
  def twoByTwo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val treated = (0 until 3).flatMap { r =>
      Seq(
        Obs(1 + 2 * r, 1, 1.0, 2, 0, 0, 1), Obs(1 + 2 * r, 2, 3.0, 2, 0, 0, 1),
        Obs(2 + 2 * r, 1, 2.0, 2, 0, 0, 1), Obs(2 + 2 * r, 2, 5.0, 2, 0, 0, 1))
    }
    val control = (0 until 3).flatMap { r =>
      Seq(
        Obs(7 + 2 * r, 1, 0.0, 0, 0, 0, 1), Obs(7 + 2 * r, 2, 1.0, 0, 0, 0, 1),
        Obs(8 + 2 * r, 1, 1.0, 0, 0, 0, 1), Obs(8 + 2 * r, 2, 1.0, 0, 0, 0, 1))
    }
    (treated ++ control).toDF()
  }
}
