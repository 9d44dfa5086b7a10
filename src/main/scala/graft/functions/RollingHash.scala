package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's UTF-8 bytes — a native
  * Catalyst `Expression` with whole-stage codegen (document
  * fingerprinting kernel; the reference's per-doc hashing role is
  * pickle identity, SURVEY §2.9 "cheap pure functions" tier).
  *
  *   h = fold(bytes, 0) { (h, b) => (h * 31 + (b & 0xff)) % 1_000_000_007 }
  *
  * Codegen keeps it inside the WholeStageCodegen span — no UDF
  * serialization boundary, no row-at-a-time interpretation.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bs = ctx.freshName("bs")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bs = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bs.length; $i++) {
         |  $h = ($h * 31L + ($bs[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Register `rolling_hash(str)` for SQL/expr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
}
