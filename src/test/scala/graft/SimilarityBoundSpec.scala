package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The query-side bound contract of the similarity family: every ANN
  * entry point refuses an over-budget query set (the one structure
  * whose driver/broadcast footprint could otherwise grow with the
  * corpus), and the explicit-queries *For entry points agree exactly
  * with the corpus-derived convenience wrappers on the same set.
  */
class SimilarityBoundSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 60).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f), i % 3)
    }.toDF("vec_id", "embedding", "label")
  }

  test("pqTopK refuses a query set larger than maxQueries") {
    val e = intercept[IllegalArgumentException] {
      // queryEvery=1 → 60 queries > maxQueries=5
      Similarity.pqTopK(spark, corpus, k = 3, m = 4, ksub = 8,
        queryEvery = 1, maxQueries = 5).collect()
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("annTopK refuses a query set larger than maxQueries") {
    val e = intercept[IllegalArgumentException] {
      Similarity.annTopK(spark, corpus, k = 3, bits = 6,
        queryEvery = 1, maxQueries = 5).collect()
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("ivfTopK refuses a query set larger than maxQueries") {
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(spark, corpus, k = 3, codebookSize = 8,
        queryEvery = 1, maxQueries = 5).collect()
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("explicit-queries pqTopKFor equals the corpus-derived wrapper") {
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    val a = Similarity.pqTopKFor(spark, corpus, queries, k = 4, m = 4, ksub = 8)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Similarity.pqTopK(spark, corpus, k = 4, m = 4, ksub = 8, queryEvery = 20)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("explicit-queries annTopKFor equals the corpus-derived wrapper") {
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    val a = Similarity.annTopKFor(spark, corpus, queries, k = 4, bits = 6)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Similarity.annTopK(spark, corpus, k = 4, bits = 6, queryEvery = 20)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("explicit-queries ivfTopKFor equals the corpus-derived wrapper (nprobe 1 and 2)") {
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    for (np <- Seq(1, 2)) {
      val a = Similarity.ivfTopKFor(spark, corpus, queries, k = 4,
        codebookSize = 8, nprobe = np).collect().map(_.toSeq).sortBy(_.toString)
      val b = Similarity.ivfTopK(spark, corpus, k = 4, codebookSize = 8,
        queryEvery = 20, nprobe = np).collect().map(_.toSeq).sortBy(_.toString)
      assert(a.toSeq === b.toSeq, s"nprobe=$np")
    }
  }

  test("a query set exactly at maxQueries is accepted") {
    val queries = corpus.filter(col("vec_id") < 3) // 3 queries, max 3
    val out = Similarity.pqTopKFor(spark, corpus, queries, k = 2,
      m = 4, ksub = 8, maxQueries = 3).collect()
    assert(out.nonEmpty)
  }
}
