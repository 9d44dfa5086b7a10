package graft

import graft.operators.TextOps
import graft.sources.Tables

/** Pins the q92 contract: the fixed-width 128-bit-fingerprint plan
  * (the shipping default) produces row-identical results to the
  * collision-free raw-string plan on the fixture corpus — which is
  * what keeps the string-keyed DuckDB oracle exact for the hash plan.
  */
class SpanDedupSpec extends SparkSpec {

  test("hashed span dedup ≡ string span dedup on the sf0.001 corpus") {
    val docs = Tables.table(spark, sf001, "documents")
    val hashed = TextOps.spanDedup(docs, "doc_id", "text", k = 20)
    val strs = TextOps.spanDedup(docs, "doc_id", "text", k = 20, hashed = false)
    assert(hashed.collect().toSeq == strs.collect().toSeq)
  }

  test("hashed plan flags planted duplicate spans exactly") {
    import spark.implicits._
    val toks = (1 to 25).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, toks),                     // 6 spans, all shared with doc 2
      (2L, toks + " extra"),          // 7 spans, 6 shared
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")), // unique spans
      (4L, "short text only")         // < 20 tokens → 0 spans
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 6L, 6L), (2L, 7L, 6L), (3L, 11L, 0L), (4L, 0L, 0L)))
  }
}
