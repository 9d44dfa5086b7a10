package graft

import org.apache.spark.sql.functions._

/** Pins q261's recoverability contract (round-11 verdict task 2):
  * expanding the composed per-representative decontamination over md5
  * group membership reproduces q115's raw per-doc output EXACTLY —
  * identical texts have identical 3-gram sets, so every group member
  * inherits its representative's (n_shared, contaminated). This is
  * what licenses running the cheap representatives-only gram join at
  * 100 TB and still answering any per-doc contamination question.
  */
class DeconCompositionSpec extends SparkSpec {

  test("q261 expanded over md5 groups equals q115's raw output (sf0.001)") {
    val raw = SparkEntry.queries("q115_bloom_decontaminate")(spark, sf001)
      .select(col("doc_id"), col("n_shared"), col("contaminated"))
    val composed = SparkEntry.queries("q261_decon_compose")(spark, sf001)

    // membership map: corpus doc → its md5 representative
    val corpus = graft.sources.Tables.table(spark, sf001, "documents")
      .filter(col("source") =!= "src2")
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val reps = corpus.groupBy(col("fp")).agg(min(col("doc_id")).as("rep_id"))
    val expanded = corpus.join(reps, Seq("fp"))
      .join(composed, Seq("rep_id"))
      .select(col("doc_id"), col("n_shared"), col("contaminated"))

    assert(expanded.count() == raw.count())
    assert(expanded.exceptAll(raw).isEmpty && raw.exceptAll(expanded).isEmpty)

    // multiplicity accounting: Σ n_copies over groups = corpus size,
    // and Σ n_copies over contaminated groups = raw contaminated count
    val sums = composed.agg(
      sum(col("n_copies")),
      sum(when(col("contaminated") === 1, col("n_copies")).otherwise(0L)))
      .collect()(0) // 1-row scalar
    assert(sums.getLong(0) == raw.count())
    assert(sums.getLong(1) ==
      raw.filter(col("contaminated") === 1).count())

    // non-vacuous: the identity must be exercised by real duplication
    // and real contamination, or it proves nothing
    assert(composed.filter(col("n_copies") >= 2).count() > 0 ||
      raw.count() == composed.count(),
      "no exact-duplicate groups AND counts differ — inconsistent")
    assert(sums.getLong(1) > 0, "no contaminated docs — identity is vacuous")
  }
}
