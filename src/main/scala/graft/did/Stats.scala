package graft.did

import org.apache.commons.math3.distribution.NormalDistribution

/** Small numerical helpers shared by the DiD estimators.
  *
  * The exact type-1 ("inverted_cdf") quantile matches NumPy's
  * `np.quantile(..., method="inverted_cdf")` used by the reference
  * bootstrap (`csdids/mboot.py:128-137`). Spark's `percentile_approx`
  * has different semantics and must NOT be substituted for parity
  * numbers (SURVEY.md §7.6).
  */
object Stats {
  private val stdNormal = new NormalDistribution(0.0, 1.0)

  /** Standard normal quantile function (scipy.stats.norm.ppf). */
  def normPpf(p: Double): Double = stdNormal.inverseCumulativeProbability(p)

  /** Exact type-1 / inverted-CDF quantile of an unsorted sample.
    * For sorted x of length m: index = max(ceil(p*m) - 1, 0).
    */
  def quantileType1(xs: Array[Double], p: Double): Double = {
    require(xs.nonEmpty, "quantile of empty sample")
    val sorted = xs.sorted
    val m = sorted.length
    val idx = math.max(math.ceil(p * m).toInt - 1, 0)
    sorted(math.min(idx, m - 1))
  }

  /** Machine-epsilon threshold used by the reference for degenerate
    * SEs/dimensions: sqrt(eps) * 10 (`csdids/mboot.py:121`,
    * `csdids/ATTgt.py:672`). */
  val DegenerateTol: Double = math.sqrt(math.ulp(1.0)) * 10
}
