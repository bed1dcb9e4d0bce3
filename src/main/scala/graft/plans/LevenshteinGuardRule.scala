package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: bounded-edit-distance predicates
  * `levenshtein(a, b) <= k` (k a non-negative int literal, any of the
  * four comparison spellings) are rewritten to
  *
  * {{{ abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0 }}}
  *
  * Two independent wins, both sound for unit-cost edit distance:
  *
  *  1. '''Length guard''': `|len(a) - len(b)|` lower-bounds the
  *     distance, so the cheap guard rejects most candidate pairs before
  *     the O(m*n) DP runs — the classic filter in fuzzy-join loops.
  *  2. '''Threshold form''': Spark's 3-arg `Levenshtein` (returns -1
  *     when the distance exceeds the threshold) computes a banded DP in
  *     O(k * min(m, n)) instead of O(m * n), and bails out early.
  *
  * Null semantics are unchanged: if either side is null both the
  * original predicate and the rewrite evaluate to null (filtered out).
  * The rule is idempotent — a conjunction that already carries the
  * guard for the same (a, b, k) is left alone — so re-running the
  * optimizer (AQE re-plans, nested invocations) cannot stack guards.
  *
  * Registered session-wide via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`). */
object LevenshteinGuardRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (a, b, k) for any spelling of `levenshtein(a,b) <= k` with an
    * UN-thresholded levenshtein (a thresholded one is already rewritten
    * — matching it again would loop) and a non-negative int literal. */
  private def bounded(e: Expression)
      : Option[(Expression, Expression, Int)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 => Some((a, b, k))
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 => Some((a, b, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 => Some((a, b, k))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 => Some((a, b, k - 1))
    case _ => None
  }

  private def lengthGuard(a: Expression, b: Expression, k: Int): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))),
      Literal(k, IntegerType))

  private def rewrite(a: Expression, b: Expression, k: Int): Expression =
    And(lengthGuard(a, b, k),
      GreaterThanOrEqual(
        Levenshtein(a, b, Some(Literal(k, IntegerType))),
        Literal(0, IntegerType)))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = conjuncts.map { c =>
        bounded(c).map { case (a, b, k) => rewrite(a, b, k) }.getOrElse(c)
      }
      if (rewritten == conjuncts) f
      else Filter(rewritten.reduce(And), child)
  }
}

/** Session extension wiring for the engine's optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => LevenshteinGuardRule)
    ext.injectOptimizerRule(_ => JaroGuardRule)
  }
}
