package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: strengthen edit-distance threshold predicates with their
  * implied length band — `levenshtein(a, b) ≤ k` implies
  * `abs(length(a) − length(b)) ≤ k` (deleting/inserting is the only way to
  * change length, and each costs 1), so the conjunct can be added without
  * changing results.
  *
  * Why an optimizer rule and not a rewrite at the call site: the band is
  * what makes a threshold predicate CHEAP to evaluate — length() is O(1)
  * per row while the Levenshtein DP is O(|a|·|b|) — and Catalyst orders a
  * conjunction left-to-right, so the added band short-circuits the DP for
  * every row outside it. Library code (ops.Dedup.editDistancePairs) builds
  * its bands explicitly; this rule gives the same protection to plain-SQL
  * users of the session (`spark.sql.extensions=graft.GraftExtensions`)
  * who write the naive predicate — in scans and in join conditions alike.
  *
  * Null semantics are preserved: when either side is NULL both the
  * original predicate and the band evaluate to NULL, and NULL AND x is
  * never true. Idempotent by construction — a band that is already
  * present (semantically) is not added again, so the fixpoint runner
  * terminates.
  */
object EditDistanceBandRule extends Rule[LogicalPlan] with PredicateHelper {

  private def band(l: Expression, r: Expression): Expression =
    Abs(Subtract(Length(l), Length(r)))

  private def strengthened(cond: Expression): Expression = {
    val cs = splitConjunctivePredicates(cond)
    val inferred = cs.flatMap {
      case LessThanOrEqual(Levenshtein(l, r, _), k @ Literal(_, IntegerType)) =>
        Some(LessThanOrEqual(band(l, r), k))
      case LessThan(Levenshtein(l, r, _), k @ Literal(_, IntegerType)) =>
        Some(LessThan(band(l, r), k))
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(l, r, _)) =>
        Some(GreaterThanOrEqual(k, band(l, r)))
      case GreaterThan(k @ Literal(_, IntegerType), Levenshtein(l, r, _)) =>
        Some(GreaterThan(k, band(l, r)))
      case _ => None
    }.filterNot(b => cs.exists(_.semanticEquals(b)))
    if (inferred.isEmpty) cond
    // band FIRST: conjunctions evaluate left-to-right, so the O(1) length
    // check rejects before the O(n·m) DP runs
    else (inferred ++ cs).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val n = strengthened(cond)
      if (n.fastEquals(cond)) f else f.copy(condition = n)
    case j @ Join(_, _, _, Some(cond), _) =>
      val n = strengthened(cond)
      if (n.fastEquals(cond)) j else j.copy(condition = Some(n))
  }
}
