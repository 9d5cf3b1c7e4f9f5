package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Engine optimizer rule (the `injectOptimizerRule` extension point —
  * SURVEY.md §4's third tier alongside the native Expression and the
  * as-of planner Strategy).
  *
  * Rewrites `cosine_sim(x, x)` → `if(isnull(x), null, 1.0)` when both
  * children are the SAME deterministic expression. Self-similarity shows
  * up naturally when dedup pipelines join a table to itself on vector
  * columns; the original evaluates a full O(dim) fused loop per row, the
  * rewrite is a null check.
  *
  * This is a semantics-RELAXING rewrite (the fast-math class of
  * optimization), stated plainly:
  *  - for ordinary non-zero vectors the unoptimized double arithmetic
  *    computes nx/√nx/√nx, which is NOT exactly 1.0 (two roundings —
  *    e.g. nx=5 → 0.9999999999999998); the rewrite emits exactly 1.0,
  *    so enabling the rule can change low bits of query output;
  *  - an ALL-ZERO vector yields NaN (0/0) unoptimized vs 1.0 rewritten,
  *    and NaN/Inf elements likewise collapse to 1.0;
  *  - a null ELEMENT (not a null array) yields NULL unoptimized — the
  *    element-null poisons the sum, see CosineSimilarity.nullSafeEval —
  *    but 1.0 rewritten (the If only checks whole-array nullness), so a
  *    pipeline using null propagation to flag dirty vectors must not
  *    enable this rule.
  * For that reason the rule is NOT injected by [[GraftExtensions]] —
  * sessions opt in explicitly (experimental.extraOptimizations) when the
  * per-row O(dim) saving matters more than bit-exactness, the same
  * consent model as ANSI/fast-float flags.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
          .asInstanceOf[Expression]
    }
}
