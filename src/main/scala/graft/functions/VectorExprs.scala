package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Strict left-fold dot product over two ARRAY<DOUBLE> columns as a
  * native codegen'd Catalyst `Expression` — the vector-kernel hot op
  * (SURVEY §2.9 "cheap pure functions" tier, used by the similarity
  * extension q27/q43/q52/q57).
  *
  * Numerically identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * (0.0-seeded left fold, so `((0+p₀)+p₁)+…`) and to DuckDB's
  * `list_reduce(list_prepend(0.0, products), +)` — but those
  * higher-order forms are interpreted row-at-a-time AND re-inlined
  * once per referencing column; this stays inside whole-stage codegen
  * with one primitive loop.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotp"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖² as a single-scan fold — the self-dot special case. Every ANN
  * query norms its vectors with `dotp(v, v)`; evaluating that as the
  * general binary op reads each element twice (and re-checks the
  * shared length twice). Numerically IDENTICAL to `DotProduct(a, a)`
  * (same 0.0-seeded ascending fold of xᵢ·xᵢ), so the
  * `GraftExtensions.SelfDotRewrite` optimizer rule — the single
  * rewrite site; `dotp` itself cannot special-case self-dots
  * pre-analysis (see its entry comment) — can never change a result,
  * only halve the array reads. */
case class Norm2(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm2"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Norm2 =
    copy(child = newChild)
}

/** The DECLARATIVE dot product's exact semantics as one codegen'd
  * kernel: `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)`
  * returns NULL when the lengths differ (zip_with pads the shorter
  * side with nulls → null products → the Add fold absorbs to null)
  * and when any element is null; otherwise the 0.0-seeded ascending
  * fold of products. The library's own queries call `dotp`
  * (min-length, null-blind) directly; DotFold exists so
  * `GraftExtensions.FoldedDotRewrite` can swap a user-written
  * higher-order chain — interpreted, re-inlined per referencing
  * column — for a primitive whole-stage-codegen loop WITHOUT changing
  * the result on any input, including the degenerate ones. */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fold"

  // returning null from nullSafeEval yields a null result (the
  // mismatch/null-element cases); input-null handling is inherited
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry: dotp(a, b) over ARRAY<DOUBLE>. Self-dots are
    * NOT special-cased here — Spark 4 Columns arrive as
    * `ColumnNodeExpression` trees whose Origins differ per call site,
    * so equality is only decidable post-analysis; that's
    * `GraftExtensions.SelfDotRewrite`'s job (installed by the graft
    * mains via `GraftExtensions.install`). */
  def dotp(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register `dotp(a, b)` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dotp", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}
