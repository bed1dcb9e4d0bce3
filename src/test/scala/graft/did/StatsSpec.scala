package graft.did

import org.scalatest.funsuite.AnyFunSuite

/** Pins quantileType1 to NumPy `method="inverted_cdf"` semantics — the
  * values below were computed with np.quantile(..., method="inverted_cdf")
  * on the same arrays (reference usage: csdids/mboot.py:128-137). */
class StatsSpec extends AnyFunSuite {
  test("type-1 quantile on 1..10") {
    val xs = (1 to 10).map(_.toDouble).toArray
    assert(Stats.quantileType1(xs, 0.25) == 3.0)  // inverted_cdf; type-7 would give 3.25
    assert(Stats.quantileType1(xs, 0.75) == 8.0)
    assert(Stats.quantileType1(xs, 0.5) == 5.0)
    assert(Stats.quantileType1(xs, 0.95) == 10.0)
    assert(Stats.quantileType1(xs, 0.0) == 1.0)
    assert(Stats.quantileType1(xs, 1.0) == 10.0)
  }
  test("type-1 quantile on odd-length unsorted") {
    val xs = Array(5.0, 1.0, 4.0, 2.0, 3.0)
    assert(Stats.quantileType1(xs, 0.5) == 3.0)
    assert(Stats.quantileType1(xs, 0.2) == 1.0)
    assert(Stats.quantileType1(xs, 0.21) == 2.0)
  }
  test("normal ppf matches scipy.stats.norm.ppf") {
    assert(math.abs(Stats.normPpf(0.975) - 1.959963984540054) < 1e-12)
    assert(math.abs(Stats.normPpf(0.75) - 0.6744897501960817) < 1e-12)
  }
}
