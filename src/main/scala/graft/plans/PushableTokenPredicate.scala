package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule: token-membership predicates like
  * `array_contains(split(text, ' '), 'needle')` cannot reach the parquet
  * scan (the split blocks pushdown). But substring containment is a
  * NECESSARY condition for token membership, so the rule conjoins a
  * pushable `Contains(text, 'needle')` prefilter, which lands in
  * PushedFilters as StringContains and skips row groups / rows before
  * the exact token check runs.
  *
  * This is the scan-side stand-in for the reference's inverted tag index
  * (all_posts_by_tag, main.rs:55): at 100 TB the index is the scan
  * statistics, not a RAM HashMap.
  *
  * Sound for OR/AND combinations (necessary conditions compose), and
  * idempotent (skips when the derived conjunct is already present).
  */
object PushableTokenPredicate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      necessaryPushable(cond) match {
        case Some(derived) if !conjuncts(cond).exists(_.semanticEquals(derived)) =>
          Filter(And(derived, cond), child)
        case _ => f
      }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** A pushable expression implied by `e`, if one exists. */
  private def necessaryPushable(e: Expression): Option[Expression] = e match {
    case And(l, r) =>
      (necessaryPushable(l), necessaryPushable(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) =>
      // a disjunction only implies something if BOTH branches do
      for (a <- necessaryPushable(l); b <- necessaryPushable(r)) yield Or(a, b)
    case ArrayContains(StringSplit(str, Literal(delim, StringType), _), lit @ Literal(_, StringType))
        if isPlainDelimiter(delim) =>
      Some(Contains(str, lit))
    case _ => None
  }

  /** The split delimiter must be a regex that matches itself literally,
    * otherwise "token in split(s, d)" does not imply "s contains token".
    */
  private def isPlainDelimiter(delim: Any): Boolean =
    delim != null && delim.toString.matches("[a-zA-Z0-9 ,;|\\t-]+")
}
