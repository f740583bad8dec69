package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSimilarity, SelfCosine}

/** Catalyst optimizer rule: `cosine_sim(x, x)` → `SelfCosine(x)` for
  * deterministic x — a single-pass kernel that drops the dot product and
  * second norm accumulator but reproduces the binary kernel's arithmetic
  * bit-for-bit (NaN on zero-norm/empty vectors, null-in → null-out), so
  * the rewrite never changes an observable result.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.semanticEquals(r) && l.deterministic =>
        SelfCosine(l)
    }
}

/** SparkSessionExtensions entry point (SURVEY.md §4 extension hooks):
  * registers the `cosine_sim` function at the catalog level and injects
  * [[SimplifySelfCosine]] into the optimizer. Enable per session with
  * `.withExtensions(new GraftExtensions)` or cluster-wide via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => SimplifySelfCosine)
    e.injectOptimizerRule(_ => RewriteWindowTopK)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
