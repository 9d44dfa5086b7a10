package graft

import org.apache.spark.sql.functions._

/** Pins q244's recoverability contract: the composed representative
  * edge set EXACTLY reconstructs q196's raw near-dup pair count —
  * each edge stands for n_a·n_b cross-group pairs (identical texts
  * share every prefix byte, so every raw pair inherits its reps'
  * block and distance) and each exact-duplicate group adds
  * n·(n−1)/2 internal dist-0 pairs. This is the algebra that lets a
  * pipeline run the cheap composed join and still answer any
  * question posed against the raw pair set. (Premise: identical
  * texts share one lang — true of the corpus by construction; a
  * cross-lang identical text would land its copies in different
  * q196 blocks while the md5 stage still collapses them.)
  */
class DedupCompositionSpec extends SparkSpec {

  test("q244 edges + exact-group internals reconstruct q196's raw pair count") {
    val raw = SparkEntry.queries("q196_fuzzy_match")(spark, sf001).count()

    val crossPairs = SparkEntry.queries("q244_dedup_compose")(spark, sf001)
      .agg(coalesce(sum(col("pair_mult")), lit(0L)))
      .collect()(0).getLong(0) // 1-row scalar
    val internalPairs = graft.sources.Tables.table(spark, sf001, "documents")
      .groupBy(md5(col("text"))).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .agg(coalesce(sum(col("n") * (col("n") - 1) / lit(2)), lit(0L)).cast("long"))
      .collect()(0).getLong(0) // 1-row scalar

    // the identity's stated premise, ASSERTED rather than assumed
    // (round-11 advice): every md5 group has exactly one distinct
    // lang — a cross-lang identical text would land its copies in
    // different q196 blocks while the md5 stage still collapsed them,
    // breaking the algebra below (or worse, passing by offset).
    val crossLangGroups = graft.sources.Tables
      .table(spark, sf001, "documents")
      .groupBy(md5(col("text")))
      .agg(count_distinct(col("lang")).as("nl"))
      .filter(col("nl") > 1).count()
    assert(crossLangGroups == 0,
      s"$crossLangGroups md5 groups span multiple langs — premise broken")

    assert(raw == crossPairs + internalPairs,
      s"raw q196 pairs $raw != cross $crossPairs + internal $internalPairs")
    // and the reconstruction is non-trivial on this corpus: the raw
    // set must actually contain pairs, or the identity proves nothing
    assert(raw > 0, "corpus has no near-dup pairs — identity is vacuous")
  }
}
