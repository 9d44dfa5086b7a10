package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization ADC invariants on a planted corpus. */
class PqSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map { i =>
      val v = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
      (i.toLong, v, i % 3)
    }.toArray
    vecs(25) = (25L, vecs(0)._2.clone(), 0) // exact duplicate of the query
    vecs.toSeq.toDF("vec_id", "embedding", "label")
  }

  test("exact duplicate of the query attains the minimum possible ADC → rank 1") {
    val out = Similarity.pqTopK(spark, corpus, k = 5, m = 4, ksub = 8, queryEvery = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val q0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(q0.length === 5)
    // code(dup) = per-subspace argmin of the query's own LUT rows, so
    // its ADC is Σ_m min_k lut — no other corpus row can score lower
    assert(q0.head._3 === 25L)
    assert(q0.head._4 <= q0(1)._4)
    assert(q0.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("deterministic across runs and independent of partitioning") {
    val a = Similarity.pqTopK(spark, corpus.repartition(7), k = 5, m = 4, ksub = 8, queryEvery = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(x => (x._1, x._2))
    val b = Similarity.pqTopK(spark, corpus.repartition(2), k = 5, m = 4, ksub = 8, queryEvery = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
  }
}
