package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaroWinklerExpr

/** Catalyst optimizer rule: high-threshold Jaro-Winkler predicates
  * `jaro_winkler(a, b) >= t` (t a double literal > 0.8, either
  * comparison orientation) gain a cheap LENGTH-RATIO guard evaluated
  * before the O(m*n) similarity:
  *
  * {{{ least(len(a), len(b)) >= (5t - 4) * greatest(len(a), len(b)) }}}
  *
  * Soundness: the Winkler boost is at most `0.4 * (1 - jaro)`, so
  * `jw >= t` forces the Jaro core `>= (t - 0.4) / 0.6 =: x`; the Jaro
  * core is at most `(m/|a| + m/|b| + 1) / 3` with `m <= min(|a|,|b|)`,
  * which yields `min/max >= 3x - 2 = 5t - 4`. For t <= 0.8 the bound
  * is vacuous and the rule leaves the predicate alone. Lengths are
  * BYTE lengths (`octet_length`) because the kernel itself computes
  * over UTF-8 bytes (the DuckDB convention, see JaroWinklerExpr): the
  * derivation needs |a|, |b| in the SAME measure the similarity uses,
  * and a character-length ratio does NOT bound the byte-length ratio
  * (10 ASCII chars vs 4 CJK chars is char-ratio 0.4 but byte-ratio
  * 10/12) — a char-length guard could prune a qualifying pair.
  *
  * Null semantics: the FILTER outcome is unchanged — with either side
  * null the similarity conjunct is null, and `null AND x` drops the
  * row exactly as before. Note the guard itself is NOT null in that
  * case (Spark's Least/Greatest skip null inputs, so a one-sided null
  * yields a non-null guard); the guard is sound only as an extra
  * conjunct next to the similarity predicate, which is the only place
  * this rule puts it — do not reuse [[guard]] standalone expecting
  * three-valued-logic equivalence. Idempotent: a conjunction that
  * already carries the same guard is left alone, so AQE re-optimization
  * cannot stack guards.
  *
  * Registered session-wide via [[GraftExtensions]], alongside
  * [[LevenshteinGuardRule]] — the engine's two fuzzy-predicate
  * rewrites. */
object JaroGuardRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (a, b, t) for either orientation of `jaro_winkler(a,b) >= t` /
    * `t <= jaro_winkler(a,b)` with a pruning-effective threshold. */
  private def bounded(e: Expression)
      : Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(JaroWinklerExpr(a, b),
        Literal(t: Double, DoubleType)) if t > 0.8 => Some((a, b, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType),
        JaroWinklerExpr(a, b)) if t > 0.8 => Some((a, b, t))
    case GreaterThan(JaroWinklerExpr(a, b),
        Literal(t: Double, DoubleType)) if t > 0.8 => Some((a, b, t))
    case LessThan(Literal(t: Double, DoubleType),
        JaroWinklerExpr(a, b)) if t > 0.8 => Some((a, b, t))
    case _ => None
  }

  private def guard(a: Expression, b: Expression, t: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(OctetLength(a), OctetLength(b))), DoubleType),
      Multiply(Literal(5.0 * t - 4.0, DoubleType),
        Cast(Greatest(Seq(OctetLength(a), OctetLength(b))), DoubleType)))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = conjuncts.flatMap { c =>
        bounded(c) match {
          case Some((a, b, t)) =>
            val g = guard(a, b, t)
            if (conjuncts.exists(_.semanticEquals(g))) Seq(c)
            else Seq(g, c)
          case None => Seq(c)
        }
      }
      if (rewritten == conjuncts) f
      else Filter(rewritten.reduce(And), child)
  }
}
