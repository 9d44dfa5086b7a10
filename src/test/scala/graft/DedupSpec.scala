package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** MinHash-LSH / SimHash / ANN behavior on planted near-duplicates. */
class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"
    val nearDup = base.replace("tonight", "today") // 1-word edit
    val other = (1 to 20).map(i => s"word$i item$i thing$i").mkString(" ")
    Seq((0L, base), (1L, nearDup), (2L, other), (3L, base)) // 3 = exact dup of 0
      .toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-dup and exact-dup pairs, not unrelated") {
    val pairs = Dedup.minhashCandidatePairs(corpus, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.5, shingleK = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: always caught
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L }) // unrelated never
  }

  test("incremental matches: new docs probe the index, within-batch dups don't match") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"
    val index = Seq(
      (0L, base),
      (1L, (1 to 20).map(i => s"idx$i token$i").mkString(" "))).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, base.replace("tonight", "today")),   // near-dup of indexed 0
      (11L, (1 to 20).map(i => s"new$i fresh$i").mkString(" ")), // clean
      (12L, (1 to 20).map(i => s"new$i fresh$i").mkString(" "))  // dup of 11 ONLY
    ).toDF("doc_id", "text")
    val got = Dedup.minhashIncrementalMatches(index, newDocs, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.5, shingleK = 3)
      .select("id", "dup_of").as[(Long, Long)].collect().toMap
    assert(got(10L) === 0L)  // matched its indexed twin
    assert(got(11L) === -1L) // clean vs the index
    assert(got(12L) === -1L) // within-batch duplicate is NOT an index match
  }

  test("minhash signature is deterministic and length-stable") {
    val sigs = corpus.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.tokenHashes(Dedup.wordShingles(col("text"), 3)), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L).length === 64)
    assert(sigs(0L) === sigs(3L)) // identical text → identical signature
    assert(sigs(0L) !== sigs(2L))
  }

  test("simhash: identical text → identical hash; near-dup → small hamming distance") {
    val hs = Dedup.simhashBuckets(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(0L) === hs(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0L), hs(1L)) < ham(hs(0L), hs(2L)))
    assert(ham(hs(0L), hs(1L)) <= 8) // 1-word edit flips few bits
  }

  test("hot-bucket guard: a flood of identical docs is skipped, small buckets survive") {
    import spark.implicits._
    val flood = (100L until 1100L).map(i =>
      (i, "same text repeated for every flooded document in this degenerate corpus tonight"))
    val pair = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val df = (pair ++ flood).toDF("doc_id", "text")
    spark.conf.set("graft.lsh.logDrops", "true")
    try {
      // cap 100 < 1000 flood docs: every flood bucket skipped (no B²
      // blow-up), while the size-2 buckets of the planted pair survive
      val pairs = Dedup.minhashCandidatePairs(df, "doc_id", "text",
          numHashes = 32, bands = 8, threshold = 0.5, shingleK = 3, maxBucket = 100)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((0L, 1L)))
    } finally spark.conf.unset("graft.lsh.logDrops")
  }

  test("ANN finds the planted exact-duplicate neighbor (bucket-certain)") {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val vecs = (0 until 120).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      (i.toLong, v, 0)
    }
    // vec 100 := copy of vec 0 → same bucket, cosine 1.0
    val planted = vecs.updated(100, (100L, vecs(0)._2.clone(), 0))
    val df = planted.toDF("vec_id", "embedding", "label")
    val top = Similarity.annTopK(spark, df, k = 5, bits = 8, queryEvery = 100)
      .filter(col("qid") === 0).select("cid", "rank").collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) === 100L) // rank 1 = the planted duplicate
  }
}
