package graft

import graft.queries.AnalyticsQueries11

/** Executable form of the order-free sampling argument (round-15
  * verdict task 1): q278's sampled leg filters the FULL graph's
  * (degree, id) orientation, while q281 — the estimate-only plan a
  * 100 TB run executes — samples FIRST and orients the p-fraction
  * under the SAMPLE's own degree order. Two different total orders
  * over the same pinned-hash survivor edges; the triangle SET of an
  * oriented wedge count is invariant under the choice of total order
  * (each triangle closes exactly once whatever the order), so both
  * plans must report identical sampled counts over identical
  * surviving edge tallies. */
class TriangleSpec extends SparkSpec {

  test("q281 (sample-first) counts the same triangle set as q278's sampled leg") {
    val r278 = AnalyticsQueries11
      .queries("q278_doulion_triangles")(spark, sf001).collect().head
    val r281 = AnalyticsQueries11
      .queries("q281_doulion_estimate")(spark, sf001).collect().head
    assert(r281.getAs[Long]("n_sampled_edges") ===
      r278.getAs[Long]("n_sampled_edges"),
      "the pinned hash must keep the same undirected edges in both plans")
    assert(r281.getAs[Long]("sampled_triangles") ===
      r278.getAs[Long]("sampled_triangles"),
      "different total orders must count the same triangle set")
    assert(r281.getAs[Long]("est_triangles") ===
      125L * r281.getAs[Long]("sampled_triangles"))
  }

  test("canonical orientation emits exactly the symmetric build's oriented rows") {
    // round-16 optimization gate: orientEdgesFromCanon∘coPurchaseEdgesCanon
    // must produce the SAME (u, v, dv) row set as the symmetric
    // orientEdges∘coPurchaseEdges it replaces in q173/q278/q280/q281 —
    // same edges, same (degree, id) total order, half the build mass
    val canon = AnalyticsQueries11
      .orientEdgesFromCanon(AnalyticsQueries11.coPurchaseEdgesCanon(spark, sf001))
    val sym = AnalyticsQueries11
      .orientEdges(AnalyticsQueries11.coPurchaseEdges(spark, sf001))
    assert(canon.exceptAll(sym).isEmpty && sym.exceptAll(canon).isEmpty,
      "the two orientation builds must agree row-for-row")
    assert(canon.count() > 0L, "the sf0.001 graph must be non-trivial")
  }

  test("q282 counts each butterfly exactly once on a constructed bipartite graph") {
    import spark.implicits._
    // Orders 1, 2, 3 all buy {10, 20} → pair (10, 20) has support 3 →
    // C(3,2) = 3 butterflies; order 4 = {10, 30} adds a support-1
    // pair contributing none. Duplicate incidence rows must dedup.
    val li = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 30L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = graft.queries.Q.scratchDir(spark, "butterflyspec")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = AnalyticsQueries11.queries("q282_butterfly_count")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_butterflies") === 3L)
    assert(r.getAs[Long]("n_support_pairs") === 1L)
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Long]("max_support") === 3L)
  }

  test("q285's order-sampled butterflies: keep-all equals exact, keep-none zero") {
    // degenerate sampling rates make the C(cs, 2) identity checkable
    // exactly: keeping every order must reproduce the exact count,
    // keeping none must leave zero sampled butterflies
    val all = AnalyticsQueries11
      .coPurchasePairSupportsSampled(spark, sf001, "ok % 1 = 0")
      .agg(org.apache.spark.sql.functions.expr("sum(c*(c-1) DIV 2)"),
        org.apache.spark.sql.functions.expr("sum(cs*(cs-1) DIV 2)"))
      .collect().head
    assert(all.getLong(0) === all.getLong(1))
    val none = AnalyticsQueries11
      .coPurchasePairSupportsSampled(spark, sf001, "ok < 0")
      .agg(org.apache.spark.sql.functions.expr("sum(cs*(cs-1) DIV 2)"))
      .collect().head
    assert(none.getLong(0) === 0L)
    // and the shipped row's scale-up is the exact 25x integer
    val row = AnalyticsQueries11
      .queries("q285_butterfly_sample")(spark, sf001).collect().head
    assert(row.getAs[Long]("est_butterflies") ===
      25L * row.getAs[Long]("sampled_butterflies"))
    assert(row.getAs[Long]("sampled_butterflies") <=
      row.getAs[Long]("exact_butterflies"))
  }
}
