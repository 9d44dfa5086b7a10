package graft

import graft.functions.{DotProduct, Norm2, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SparkSessionExtensions entry point — registers the library's native
  * expressions at session build time, so any session created with
  *
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (or `.withExtensions(new GraftExtensions)`) has `rolling_hash` and
  * `dotp` available in SQL without per-session registry calls. The
  * per-session `RollingHash.register`/`VectorExprs.register` helpers
  * remain for sessions the library doesn't own (e.g. the driver's).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProduct].getName, "dotp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => SelfDotRewrite)
  }
}

/** Optimizer rule: `dotp(e, e)` → `norm2(e)` — the self-dot norm every
  * ANN plan computes (q27/q43/q52/q57 all norm with `dotp(vd, vd)`),
  * halved to one array read per element. Runs post-analysis, where
  * `semanticEquals` sees resolved attribute references (pre-analysis
  * the Spark 4 Column API yields `ColumnNodeExpression` trees whose
  * call-site Origins defeat structural equality). Restricted to
  * deterministic children — a nondeterministic `e` must evaluate twice
  * in `dotp(e, e)`, so collapsing it would change semantics. The fold
  * arithmetic is identical (see Norm2), so results are bit-equal. */
object SelfDotRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) => Norm2(a)
    }
}

object GraftExtensions {
  /** Install the optimizer rule into an EXISTING session (the
    * `spark.sql.extensions` hook only runs at session build, which the
    * driver's harness sessions don't go through). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SelfDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotRewrite
}
