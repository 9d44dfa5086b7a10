package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** The codegen'd DotProduct expression: bit-equality with the
  * higher-order fold it replaces, SQL registration, null handling. */
class VectorExprSpec extends SparkSpec {

  test("dotp is bit-identical to the 0.0-seeded left fold (200 random vectors)") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val rows = Seq.fill(200)((Array.fill(64)(r.nextDouble() * 2 - 1),
      Array.fill(64)(r.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("fold",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .withColumn("native", VectorExprs.dotp(col("a"), col("b")))
    val bad = df.filter(col("fold") =!= col("native")).count()
    assert(bad === 0)
  }

  test("dotp registers for SQL and survives codegen") {
    import spark.implicits._
    VectorExprs.register(spark)
    val out = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .selectExpr("dotp(a, b) AS d").as[Double].head()
    assert(out === 32.0)
  }

  test("SelfDotRewrite collapses dotp(a, a) to norm2, bit-equal to the binary op") {
    import spark.implicits._
    GraftExtensions.install(spark)
    // range source: a LocalRelation would be fully evaluated by
    // ConvertToLocalRelation before the rewrite is observable
    val df = spark.range(100)
      .select(transform(sequence(lit(0), lit(63)),
        j => sin(col("id") * 64 + j)).as("a"))
      .withColumn("self", VectorExprs.dotp(col("a"), col("a")))
      // a distinct-but-equal column defeats semanticEquals → binary op
      .withColumn("copyv", transform(col("a"), x => x))
      .withColumn("viaDot", VectorExprs.dotp(col("a"), col("copyv")))
    assert(df.queryExecution.optimizedPlan.toString.contains("norm2"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.filter(col("self") =!= col("viaDot")).count() === 0)
  }

  test("dotp is null-safe and length-tolerant (min length)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0, 5.0)),
      (null.asInstanceOf[Array[Double]], Array(1.0))).toDF("a", "b")
      .withColumn("d", VectorExprs.dotp(col("a"), col("b")))
    val rows = df.select("d").collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
  }
}
