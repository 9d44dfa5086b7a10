package graft

import graft.queries.AnalyticsQueries5
import org.apache.spark.sql.functions._

/** Semantics pins for q200–q202: transitive fuzzy clusters on a
  * constructed corpus, sampled join-cardinality arithmetic, and the
  * merge-equals-recompute IVM invariant. */
class AnalyticsQueries5bSpec extends SparkSpec {

  test("q200 resolves transitive matches into one cluster") {
    import spark.implicits._
    val dir = graft.queries.Q.scratchDir(spark, "analytics5b")
    // A chain: d1~d2 (dist 2), d2~d3 (dist 2), d1~d3 (dist 4 — still
    // ≤ 15 but irrelevant: transitivity alone must merge them).
    // d10/d11: identical prefixes (dist 0). d20: singleton (same
    // block, distance beyond the gate needs > 15 edits in 40 chars).
    val base = "alpha " + "x" * 34
    def mut(s: String, n: Int) = s.substring(0, s.length - n) + "y" * n
    Seq(
      (1L, base, "en"), (2L, mut(base, 2), "en"), (3L, mut(base, 4), "en"),
      (10L, "alpha common prefix here", "en"), (11L, "alpha common prefix here", "en"),
      (20L, "alpha " + "z" * 34, "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = AnalyticsQueries5.queries("q200_fuzzy_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // d20 is 34 edits from base (all x→z) and >15 from the shorter
    // d10 — a singleton, excluded. Chain {1,2,3}; pair {10,11}.
    assert(got.toSeq == Seq((1L, 3L, 6L), (10L, 2L, 21L)))
  }

  test("q201 sampled estimate uses exactly the 1/64 hash stratum, scaled x64") {
    val got = AnalyticsQueries5.queries("q201_join_cardinality")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq("events.user_id", "lineitem.l_partkey",
      "lineitem.l_suppkey", "orders.o_custkey"))
    got.foreach { case (name, exact, est, sampled) =>
      assert(exact > 0)
      assert(est % 64 == 0, s"$name estimate must be a x64 scale-up")
      assert(sampled >= 0)
      if (sampled == 0) assert(est == 0)
    }
    // recompute the user_id stratum directly and match the query
    val (ha, hb) = graft.operators.Dedup.affine(20100)
    val expect = graft.sources.Tables.events(spark, sf001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .filter(pmod(lit(ha) * pmod(col("user_id"), lit(4294967291L)) + lit(hb),
        lit(4294967291L)) % 64 === 0)
      .agg(coalesce(sum(col("cnt") * col("cnt") * 64), lit(0L)))
      .collect()(0).getLong(0)
    assert(got.find(_._1 == "events.user_id").get._3 == expect)
  }

  test("q202 merged state equals the full recompute in every row") {
    val got = AnalyticsQueries5.queries("q202_ivm_rollup")(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "n_merged == n_full")
      assert(r.getLong(3) == r.getLong(4), "sum_merged == sum_full")
      assert(r.getLong(5) == r.getLong(6), "ndv_merged == ndv_full")
    }
  }
}
