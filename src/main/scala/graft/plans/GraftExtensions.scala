package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.CosineSimilarity

/** Catalyst optimizer rule: `cosine_sim(x, x)` → `if(x IS NULL, NULL,
  * 1.0)` for deterministic x — the algebraic identity cos(v, v) = 1,
  * sparing the full dot/norm loop per row. (Precondition shared with the
  * kernel itself: vectors are normalizable; a zero-norm vector yields
  * NaN in the kernel and 1.0 here.)
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.semanticEquals(r) && l.deterministic =>
        If(IsNull(l), Literal(null, DoubleType), Literal(1.0))
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
  }
}
