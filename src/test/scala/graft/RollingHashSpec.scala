package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._

/** Custom Catalyst expression: eval + codegen + SQL registration. */
class RollingHashSpec extends SparkSpec {

  private def ref(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes("UTF-8")) h = (h * 31L + (b & 0xff)) % 1000000007L
    h
  }

  test("matches the reference fold, including empty string") {
    import spark.implicits._
    RollingHash.register(spark)
    val in = Seq("", "a", "abc", "the quick brown fox", "ü unicode ✓")
    val got = in.toDF("t").select(expr("rolling_hash(t)")).collect().map(_.getLong(0))
    assert(got.toSeq === in.map(ref))
  }

  test("null in → null out") {
    import spark.implicits._
    RollingHash.register(spark)
    val got = Seq[Option[String]](None, Some("x")).toDF("t")
      .select(expr("rolling_hash(t)")).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }

  test("survives whole-stage codegen over a real table") {
    RollingHash.register(spark)
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select(expr("rolling_hash(text)").as("h"))
    assert(df.filter(col("h") >= 0 && col("h") < 1000000007L).count() === df.count())
  }
}
