package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: prefilter edit-distance threshold predicates with the
  * length-difference lower bound.
  *
  * `levenshtein(a, b) ≤ k` implies `|len(a) − len(b)| ≤ k` (deleting the
  * length difference is the cheapest conceivable edit script), and the
  * bound costs O(1) where the distance costs O(len²). The rule rewrites
  *
  *   Filter(levenshtein(a, b) ≤ k)
  *     ⇒ Filter(|length(a) − length(b)| ≤ k AND levenshtein(a, b) ≤ k)
  *
  * (also the `<` form; `Cast(levenshtein(..))` comparisons unwrap). The
  * conjunction short-circuits left-to-right in both codegen and
  * interpreted evaluation, so length-mismatched pairs never pay the
  * quadratic loop — the standard length filter every edit-distance join
  * applies by hand, applied BY THE OPTIMIZER so callers don't have to
  * remember it.
  *
  * Semantics-preserving by the triangle bound above; idempotent: a
  * predicate whose Filter already contains a semantically equal guard is
  * left alone (the optimizer runs rule batches to fixpoint, so this is
  * load-bearing, not cosmetic).
  *
  * Registered two ways: [[install]] appends to
  * `spark.experimental.extraOptimizations` for the sessions this library
  * builds itself (Bench/Verify/tests), and `GraftExtensions` injects it
  * for cluster deployments configured via `spark.sql.extensions`. */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** `|len(a) − len(b)| ≤ k` (or `<`), cast to the literal's type so the
    * rewritten comparison type-checks exactly like the original. */
  private def guardFor(lev: Levenshtein, k: Literal,
                       strict: Boolean): Expression = {
    val Seq(a, b) = lev.children.take(2)
    val diff = Abs(Subtract(Length(a), Length(b)))
    val lhs = if (k.dataType == IntegerType) diff else Cast(diff, k.dataType)
    if (strict) LessThan(lhs, k) else LessThanOrEqual(lhs, k)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      def guarded(g: Expression): Boolean = cond.exists(_.semanticEquals(g))
      val newCond = cond.transformUp {
        case cmp @ LessThanOrEqual(e, k: Literal)
            if stripCast(e).isInstanceOf[Levenshtein] &&
              stripCast(e).children.size == 2 =>
          val g = guardFor(stripCast(e).asInstanceOf[Levenshtein], k,
            strict = false)
          if (guarded(g)) cmp else And(g, cmp)
        case cmp @ LessThan(e, k: Literal)
            if stripCast(e).isInstanceOf[Levenshtein] &&
              stripCast(e).children.size == 2 =>
          val g = guardFor(stripCast(e).asInstanceOf[Levenshtein], k,
            strict = true)
          if (guarded(g)) cmp else And(g, cmp)
      }
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
  }

  /** Append this rule to the session's extra optimizations (idempotent). */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
