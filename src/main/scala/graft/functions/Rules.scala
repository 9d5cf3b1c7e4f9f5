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
  * Domain assumption, stated plainly: for an ALL-ZERO vector the
  * original yields NaN (0/0) while the rewrite yields 1.0. Embedding
  * columns are non-zero by construction (L2-normalized or near-), and
  * cosine of the zero vector is undefined anyway, so the rule trades
  * that undefined corner for a per-row O(dim) saving. Remove the rule
  * from [[GraftExtensions]] if exact NaN propagation on zero vectors
  * ever matters.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
          .asInstanceOf[Expression]
    }
}
