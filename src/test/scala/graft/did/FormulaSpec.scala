package graft.did

import org.scalatest.funsuite.AnyFunSuite

class FormulaSpec extends AnyFunSuite {
  test("no formula means intercept-only") {
    assert(Formula.covariateNames(None) == Seq(Formula.InterceptCol))
    assert(Formula.interceptOnly(None))
  }
  test("parses 'y ~ x1 + x2'") {
    assert(Formula.covariateNames(Some("y ~ x1 + x2")) == Seq("x1", "x2"))
    assert(!Formula.interceptOnly(Some("y ~ x1 + x2")))
  }
  test("'1' maps to the synthesized intercept column") {
    assert(Formula.covariateNames(Some("y ~ 1 + x1")) ==
      Seq(Formula.InterceptCol, "x1"))
    assert(Formula.interceptOnly(Some("y ~ 1")))
  }
  test("rejects malformed formulas") {
    assertThrows[IllegalArgumentException](
      Formula.covariateNames(Some("y ~ a ~ b")))
  }
}
