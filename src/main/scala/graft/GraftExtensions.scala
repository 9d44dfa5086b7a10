package graft

import graft.functions.{DotProduct, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
  }
}
