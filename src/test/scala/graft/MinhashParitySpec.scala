package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The kernel minhash path must be bit-identical to the
  * column-expression path (same shingling, same XXH64(42), same
  * (a·h+b) mod P32 family). */
class MinhashParitySpec extends SparkSpec {

  test("kernel signatures == expression signatures on real documents") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
    val exprBase = docs.select(col("doc_id").cast("long").as("id"),
        Dedup.wordShingles(col("text"), 3).as("toks"))
      .withColumn("sig", Dedup.minhashSignature(Dedup.tokenHashes(col("toks")), 32))
    val kernBase = Dedup.minhashBase(spark, docs, "doc_id", "text", 32, 3)
    val e = exprBase.orderBy("id").collect()
    val k = kernBase.orderBy("id").collect()
    assert(e.length === k.length)
    e.zip(k).foreach { case (er, kr) =>
      assert(er.getLong(0) === kr.getLong(0))
      assert(er.getSeq[String](1) === kr.getSeq[String](1), s"toks differ for id ${er.getLong(0)}")
      assert(er.getSeq[Long](2) === kr.getSeq[Long](2), s"sig differs for id ${er.getLong(0)}")
    }
  }

  test("xxhash64String mirrors functions.xxhash64") {
    import spark.implicits._
    val in = Seq("a", "hello world", "", "ü✓")
    val got = in.toDF("t").select(xxhash64(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq === in.map(Dedup.xxhash64String))
  }
}
