package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound the edit-distance DP when only a THRESHOLD
  * comparison is consumed.
  *
  * `levenshtein(a, b)` runs the full O(|a|·|b|) dynamic program; Spark's
  * three-argument form `levenshtein(a, b, k)` runs the banded O(k·|a|)
  * variant and returns -1 the moment the distance provably exceeds k. A
  * query that only asks `levenshtein(a, b) <= k` (every fuzzy join and
  * dedup verify step in this engine — e.g. [[graft.operators.TextAnalysis
  * .fuzzyBlockedJoin]]) pays for exact distances it then throws away.
  *
  * Rewrites (k a non-negative INT literal; the unbounded form only):
  *  - `levenshtein(a, b) <= k`  →  `levenshtein(a, b, k) >= 0`
  *  - `levenshtein(a, b) <  k`  →  `levenshtein(a, b, k−1) >= 0`
  *
  * Equivalence: the thresholded form returns the true distance d when
  * d ≤ k and -1 otherwise, so `>= 0` is exactly `d <= k`; NULL inputs
  * yield NULL in both forms (both comparisons are null-intolerant). A
  * levenshtein consumed as a VALUE (projected, aggregated) never matches
  * the pattern and keeps the exact DP. Registered through
  * `SparkSessionExtensions.injectOptimizerRule` ([[graft.GraftExtensions]]),
  * which appends the rule to the operator-optimization FIXPOINT batch —
  * it runs interleaved with the built-in rules there (notably
  * UnwrapCastInBinaryComparison), and because the batch iterates to a
  * fixpoint, the rule still matches the form left after that rule strips
  * the `CAST(... AS BIGINT)` that DataFrame-side `.cast(LongType)`
  * comparisons wrap around the call (PlanSpec pins this).
  *
  * At 100 TB this is the difference between a verify step whose cost
  * tracks candidate count (banded DP on mostly-early-exit pairs) and one
  * whose cost tracks candidate count × string length² — the classic
  * reason engines special-case thresholded similarity predicates.
  */
object ThresholdLevenshteinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None),
          k @ Literal(kv: Int, IntegerType)) if kv >= 0 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
      case LessThan(Levenshtein(l, r, None),
          Literal(kv: Int, IntegerType)) if kv >= 1 =>
        GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(kv - 1))), Literal(0))
    }
}
