package graft.plans

import graft.functions.JaccardSim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: any predicate `jaccard_sim(a, b) >= t` gains the
  * exact set-size prefilter `size(a) >= t*size(b) AND size(b) >=
  * t*size(a)` as an extra conjunct.
  *
  * Why a Rule and not just operator code: graft's own operators
  * (Dedup.verifyJaccard, ngramJaccardPairs) apply the prefilter by
  * hand, but SQL users of the registered `jaccard_sim` function don't
  * know the trick — the rule applies it universally, the Catalyst way
  * (semantics-preserving rewrite injected via extensions).
  *
  * Soundness: jaccard ≥ t implies min(|A|,|B|) ≥ t·max(|A|,|B|), so
  * `pred AND prefilter ⇔ pred` as a logical equivalence — valid in any
  * boolean context (under NOT/OR too). Null analysis: pred is NULL only
  * when the jaccard is NULL (empty union → sizes 0 → prefilter TRUE;
  * null side → size NULL → prefilter NULL), and NULL AND (TRUE|NULL) =
  * NULL, so nullability is preserved exactly.
  *
  * Idempotence guard: a Filter whose condition already contains a
  * `Size` expression is left untouched (covers re-application and
  * hand-prefiltered plans).
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] {

  private def prefilter(a: Expression, b: Expression,
      t: Double): Expression = {
    def sz(e: Expression) = Cast(Size(e, legacySizeOfNull = false),
      DoubleType)
    And(
      GreaterThanOrEqual(sz(a), Multiply(Literal(t), sz(b))),
      GreaterThanOrEqual(sz(b), Multiply(Literal(t), sz(a))))
  }

  private def eligible(cond: Expression): Boolean =
    !cond.exists(_.isInstanceOf[Size]) && cond.exists {
      case GreaterThanOrEqual(_: JaccardSim, Literal(_, DoubleType)) => true
      case _ => false
    }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case geq @ GreaterThanOrEqual(j: JaccardSim,
        Literal(t: Double, DoubleType)) =>
      And(geq, prefilter(j.left, j.right, t))
  }

  /** Matches both Filter conditions and Join conditions — the main
    * optimizer batches run first and routinely push the jaccard
    * predicate into the join (PushPredicateThroughJoin). */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if eligible(cond) =>
      f.copy(condition = rewrite(cond))
    case j @ Join(_, _, _, Some(cond), _) if eligible(cond) =>
      j.copy(condition = Some(rewrite(cond)))
  }
}
