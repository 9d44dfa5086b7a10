package graft

import graft.queries.AnalyticsQueries3
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 part-3 pack: recommendation scores
  * on a hand-computable basket set, ORC write→read fidelity, gap-cap
  * behavior, and bigram positional adjacency. */
class AnalyticsQueries3Spec extends SparkSpec {

  private def run(name: String) =
    AnalyticsQueries3.queries(name)(spark, sf001)

  test("q185 scores a hand-computable basket set") {
    import spark.implicits._
    // Orders: {1,2} ×3, {1,3} ×1. n(1)=4, n(2)=3, n(3)=1.
    // score(2→1) = 10⁶·9/(3·4) = 750000; score(1→2) = 750000;
    // score(1→3) = 10⁶·1/4 = 250000; score(3→1) = 250000.
    val li = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = graft.queries.Q.scratchDir(spark, "analytics3spec")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = AnalyticsQueries3.queries("q185_item_similarity")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 3L, 750000L), (1L, 2L, 3L, 1L, 250000L),
      (2L, 1L, 1L, 3L, 750000L),
      (3L, 1L, 1L, 1L, 250000L)))
  }

  test("q186 ORC roundtrip equals the same aggregate computed directly") {
    val direct = graft.sources.Tables.events(spark, sf001)
      .groupBy(col("event_type"),
        expr("ts_ns DIV 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"),
        sum(col("sum_c")).as("sum_c"), max(col("n")).as("peak_day_n"))
      .orderBy(col("event_type"))
      .collect().map(_.toString).toSeq
    assert(run("q186_orc_roundtrip").collect().map(_.toString).toSeq == direct)
  }

  test("q187 caps gaps at 30 and loses exactly one order per multi-order customer") {
    val gaps = run("q187_repurchase_gaps").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(gaps.forall { case (g, _) => g >= 0 && g <= 30 })
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val nOrders = orders.count()
    val nCust = orders.select("o_custkey").distinct().count()
    assert(gaps.map(_._2).sum == nOrders - nCust)
  }

  test("q188 bigrams are positional (adjacent), not co-occurrence") {
    import spark.implicits._
    // "a b a b" → bigrams (a,b),(b,a),(a,b): 21 docs push (a,b) to
    // c=63 ≥ min-support 20 and (b,a) to 42; unigrams a=42·…
    // per doc: a×2, b×2 → cu(a)=84, cu(b)=84; ntok=84·2=168... per
    // 21 docs: cu=42 each? doc tokens = [a,b,a,b] → a:2,b:2 per doc
    // ⇒ cu(a)=cu(b)=42, ntok=84 for 21 docs.
    // lift(a,b) = 10⁶·63·84 // (42·42) = 3000000.
    val docs = (1 to 21).map(i => (i.toLong, "a b a b", "en", 7L, "s"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    val dir = graft.queries.Q.scratchDir(spark, "analytics3spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = AnalyticsQueries3.queries("q188_collocation_lift")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", 42L, 2000000L),
      (2L, "b", "a", 21L, 1000000L)))
  }
}
