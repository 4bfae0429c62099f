package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, DotProduct, L2Normalize}

/** Catalyst strength-reduction rule (the "(c) custom Rule" tier of the
  * custom-operator preference order, SURVEY.md §7.4): rewrite
  *
  * {{{ cosine_similarity(l2_normalize(x), l2_normalize(y)) }}}
  *
  * to
  *
  * {{{ dot_product(l2_normalize(x), l2_normalize(y)) }}}
  *
  * Unit vectors have norm 1, so the cosine's two norm accumulators and the
  * `sqrt·sqrt` divide are dead work — the rewrite removes 2/3 of the
  * per-element FLOPs in the scan's hot loop. This is the standard
  * vector-search layout at scale: normalize once at ingest, then every
  * query/scan pays dot-product cost only. The rule makes the cheap form
  * automatic for any query (DSL or SQL) that writes the composition
  * directly.
  *
  * Numerics, stated honestly: `‖x̂‖` is 1 only to within rounding (the
  * float norm of a normalized vector is 1 ± ~1 ulp), so the rewrite can
  * shift the result by O(ulp). It is NOT bit-identical to the unrewritten
  * expression; it is the same similarity to ~1e-15 relative error.
  * Edge cases are preserved exactly: zero vectors normalize to zeros (both
  * forms yield 0.0) and mismatched lengths yield NULL in both forms.
  *
  * Injected via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`); sessions without the
  * extension simply keep the unrewritten — still correct — plan.
  */
object NormalizedCosineToDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a: L2Normalize, b: L2Normalize) => DotProduct(a, b)
    }
}
