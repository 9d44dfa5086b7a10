package graft

import graft.operators.Similarity
import graft.sources.Tables

/** The IVF-PQ composite's two defining invariants: with every cell
  * probed the cell gate is a no-op (exact reduction to plain PQ ADC),
  * and growing nprobe only ever improves candidate coverage
  * (monotone: each query's nprobe=1 hit set is contained in its
  * nprobe=2 result for ranks that survive). */
class IvfPqSpec extends SparkSpec {

  private def emb = Tables.table(spark, sf001, "embeddings")

  test("probing all cells reduces IVF-PQ to plain PQ") {
    val a = Similarity.ivfPqTopK(spark, emb, k = 5, codebookSize = 8, nprobe = 8)
      .orderBy("qid", "rank").collect().toSeq
    val b = Similarity.pqTopK(spark, emb, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(a == b)
  }

  test("nprobe growth is monotone: more results per query, never a worse best") {
    def byQ(nprobe: Int): Map[Long, Seq[Double]] =
      Similarity.ivfPqTopK(spark, emb, k = 10, nprobe = nprobe)
        .orderBy("qid", "rank").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(3)).toSeq).toMap
    val p1 = byQ(1)
    val p2 = byQ(2)
    assert(p1.keySet.subsetOf(p2.keySet))
    p1.foreach { case (qid, adcs1) =>
      val adcs2 = p2(qid)
      assert(adcs2.length >= adcs1.length, s"q$qid lost candidates")
      assert(adcs2.head <= adcs1.head, s"q$qid best got worse")
    }
  }
}
