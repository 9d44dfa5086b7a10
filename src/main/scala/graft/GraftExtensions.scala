package graft

import graft.functions.{DotFold, DotProduct, Norm2, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

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
    ext.injectOptimizerRule(_ => FoldedDotRewrite)
  }
}

/** Optimizer rule: the DECLARATIVE dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * → `DotFold(a, b)`. The higher-order form is what a user following
  * the Spark docs writes; it evaluates interpreted (ArrayAggregate
  * has no codegen) and re-inlines per referencing column. DotFold is
  * one primitive loop inside whole-stage codegen with IDENTICAL
  * results on every input — including the unequal-length and
  * null-element cases, where zip_with's null padding makes the fold
  * null (which is why the rewrite target is not the null-blind
  * `dotp`). Matches commuted operand orders (IEEE double + and × are
  * commutative), but only the exact-bits +0.0 seed (a -0.0 seed
  * differs on the empty array) and only deterministic, already-
  * double-typed children (a coercion cast inside the lambda means the
  * products were not double multiplies — no rewrite). Uses the
  * WithSubqueries transform so a dot product written inside a
  * scalar/IN/EXISTS subquery is rewritten too (plain
  * transformAllExpressions does not descend into subquery plans). */
object FoldedDotRewrite extends Rule[LogicalPlan] {
  private def isVarPair(p: Expression, q: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean = (p, q) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
      (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
        (a.exprId == v2.exprId && b.exprId == v1.exprId)
    case _ => false
  }

  private def isPlusZero(v: Any): Boolean = v match {
    case d: Double => java.lang.Double.doubleToLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(ax, ay, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isPlusZero(zero) && a.deterministic && b.deterministic &&
          isVarPair(mx, my, zx, zy) && isVarPair(ax, ay, acc, el) &&
          fin.exprId == fv.exprId =>
      DotFold(a, b)
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
    plan.transformAllExpressionsWithSubqueries {
      case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) => Norm2(a)
    }
}

object GraftExtensions {
  /** Install the optimizer rule into an EXISTING session (the
    * `spark.sql.extensions` hook only runs at session build, which the
    * driver's harness sessions don't go through). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(SelfDotRewrite, FoldedDotRewrite).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
}
