package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Regression guard for the similarity family's query-side bound
  * (the round-5 "unbounded driver structure" fix): every external
  * entry point that accepts a queries DataFrame must route it through
  * `boundedQueries`, which rejects an oversized set in O(maxQueries)
  * rows instead of collecting it. Each case hands an entry point a
  * query set one row over the bound and expects the guard to throw at
  * plan-build time — if a future refactor drops the guard, the
  * oversized set silently becomes driver state and this spec fails. */
class QueryBoundSpec extends SparkSpec {

  private def embAndQueries(n: Int) = {
    import spark.implicits._
    val emb = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i * 8 + d).toFloat / 100f)))
      .toDF("vec_id", "embedding")
    // the *For contract: queries carry (vec_id, embedding) like the corpus
    val qs = (0 until n).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i + d).toFloat / 50f)))
      .toDF("vec_id", "embedding")
    (emb, qs)
  }

  private val over = 33 // maxQueries = 32 below → 33 trips the guard

  test("annTopKFor enforces the query bound") {
    val (emb, qs) = embAndQueries(over)
    val e = intercept[IllegalArgumentException] {
      Similarity.annTopKFor(spark, emb, qs, k = 3, maxQueries = 32)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("pqTopKFor enforces the query bound") {
    val (emb, qs) = embAndQueries(over)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopKFor(spark, emb, qs, k = 3, maxQueries = 32)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("ivfTopKFor enforces the query bound") {
    val (emb, qs) = embAndQueries(over)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFor(spark, emb, qs, k = 3, maxQueries = 32)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("ivfPqTopKFor enforces the query bound") {
    val (emb, qs) = embAndQueries(over)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKFor(spark, emb, qs, k = 3, maxQueries = 32)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("a bound-sized query set passes the guard") {
    val (emb, qs) = embAndQueries(32)
    assert(Similarity.annTopKFor(spark, emb, qs, k = 3, maxQueries = 32)
      .count() > 0)
  }
}
