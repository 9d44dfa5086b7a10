package graft

import org.apache.spark.sql.functions._

/** Round-18 pack pins — each new operator checked against an
  * INDEPENDENT derivation or a sibling query it must agree with:
  *
  *  - q275: the leakage audit is exactly zero BY the cluster-
  *    inheritance construction, the split rollup conserves the corpus,
  *    and a doc-level hash split on the same cluster structure is
  *    verified to be the thing the operator exists to avoid (it
  *    straddles every multi-doc cluster whose members hash apart).
  *  - q276: tokenization conserves characters per language, and its
  *    corpus-wide totals must equal q266's subword audit — same
  *    global merge table, two independent aggregations.
  *  - q277: the C=256 slice must equal q270 row-for-row (same salt,
  *    same shards, same order) — the sweep is "q270 at three knob
  *    values", provably.
  */
class SplitFertilitySpec extends SparkSpec {

  test("q275: zero leaky clusters, corpus conserved, splits well-formed") {
    val rows = SparkEntry.queries("q275_leakage_split")(spark, sf001).collect()
    val docs = graft.sources.Tables.table(spark, sf001, "documents").count()
    assert(rows.map(_.getLong(1)).sum == docs, "split sizes must cover the corpus")
    assert(rows.forall(_.getLong(4) == 0L), "cluster-inherited split must not leak")
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("q275: the doc-level split it replaces DOES leak on clustered docs") {
    import graft.operators.{Components, Dedup}
    val docs = graft.sources.Tables.table(spark, sf001, "documents")
    val edges = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      numHashes = 128, bands = 32, threshold = 0.6,
      shingleK = 3, hashFn = Dedup.polyHash)
    val comp = Components.dedupClusters(docs.select(col("doc_id").as("id")), edges)
    // q49's shape: split decided per DOC id, not per cluster
    val docSplit = comp.withColumn("split", expr(
      "CASE WHEN (" + graft.queries.Q.uhashSql("27500", "doc_id") + ") % 10 < 8 " +
        "THEN 'train' WHEN (" + graft.queries.Q.uhashSql("27500", "doc_id") +
        ") % 10 = 8 THEN 'val' ELSE 'test' END"))
    val leaky = docSplit.filter(col("cluster_n") > 1)
      .groupBy(col("cluster_id"))
      .agg(count_distinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    val multi = comp.filter(col("cluster_n") > 1).count()
    assert(multi > 0, "fixture corpus must have near-dup clusters for this test")
    assert(leaky > 0,
      "doc-level hash split should straddle some multi-doc cluster — " +
        "if not, the fixture stopped exercising the operator's reason to exist")
  }

  test("q276: per-lang char conservation and agreement with q266's audit") {
    val fert = SparkEntry.queries("q276_bpe_fertility")(spark, sf001).collect()
    // conservation: n_chars per lang = filtered [a-z]+ char count per lang
    val want = graft.sources.Tables.table(spark, sf001, "documents")
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("lang")).agg(sum(length(col("w"))).as("chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fert.foreach { r =>
      assert(r.getLong(3) == want(r.getString(0)),
        s"lang ${r.getString(0)}: chars not conserved")
      assert(r.getLong(2) >= r.getLong(1), "tokens >= words")
      assert(r.getLong(3) >= r.getLong(2), "chars >= tokens")
      assert(r.getLong(4) >= 1000L, "fertility is at least one token per word")
    }
    // same merge table as q266 (learned on the same global dict) ⇒
    // corpus-wide token and char totals must agree across the two
    // independent aggregations
    val audit = SparkEntry.queries("q266_bpe_tokenize")(spark, sf001).collect()
    assert(fert.map(_.getLong(2)).sum == audit.map(_.getLong(2)).sum,
      "q276 total tokens != q266 subword audit total")
    assert(fert.map(_.getLong(3)).sum ==
      audit.map(r => r.getLong(1) * r.getLong(2)).sum,
      "q276 total chars != q266 tok_len·corpus_freq total")
  }

  test("q277: the C=256 slice equals q270 row-for-row") {
    val sweep = SparkEntry.queries("q277_context_sweep")(spark, sf001)
    val got = sweep.filter(col("c") === 256L)
      .select("lang", "n_docs", "total_tokens", "n_chunks", "n_split_docs",
        "waste_ppm")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val want = SparkEntry.queries("q270_context_pack")(spark, sf001)
      .select("lang", "n_docs", "total_tokens", "n_chunks", "n_split_docs",
        "waste_ppm")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(got.toSeq == want.toSeq, "sweep at C=256 diverged from q270")
  }
}
