package graft

import org.apache.spark.sql.functions._

/** q266's loop-closure pins: the tokenize-with-merges apply side must
  * be exactly consistent with the q263 merge-learning side, and the
  * audit must conserve the corpus it tokenized.
  *
  *  1. CLOSURE — after applying the 6 learned merges, every token is
  *     a single character or one of q263's merged pairs (with '+'
  *     removed): the output vocabulary is the char alphabet ∪ the
  *     merge table, nothing else.
  *  2. CONSERVATION — Σ tok_len·corpus_freq = the total character
  *     count of the filtered word stream (tokenization is a
  *     partition of each word's characters), and Σ char_ppm ≈ 1e6
  *     (floor rounding loses < |vocab| ppm).
  *  3. FREQUENCY — each merged pair's corpus_freq equals the
  *     pair_count q263 recorded at the step that LAST produced it,
  *     unless a later merge consumed instances (can only decrease);
  *     conversely no single-char token can out-count its raw
  *     character frequency.
  */
class BpeTokenizeSpec extends SparkSpec {

  private lazy val audit =
    SparkEntry.queries("q266_bpe_tokenize")(spark, sf001).collect()
  private lazy val merges =
    SparkEntry.queries("q263_bpe_merges")(spark, sf001).collect()
      .map(r => (r.getString(1).split("\\+", 2).mkString, r.getLong(2)))

  test("closure: vocabulary = single chars ∪ q263's merge results") {
    val mergedToks = merges.map(_._1).toSet
    audit.foreach { r =>
      val tok = r.getString(0)
      assert(tok.length == 1 || mergedToks.contains(tok),
        s"token '$tok' is neither a char nor a learned merge")
    }
    // and every learned merge that SURVIVES (is not a strict prefix
    // consumed by a later merge) appears in the vocabulary
    val vocab = audit.map(_.getString(0)).toSet
    mergedToks.foreach { m =>
      val consumed = mergedToks.exists(o => o != m && o.contains(m))
      assert(consumed || vocab.contains(m),
        s"unconsumed merge '$m' missing from the token vocabulary")
    }
  }

  test("conservation: tok_len·corpus_freq sums to the filtered char count") {
    val totalChars = graft.sources.Tables.table(spark, sf001, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    val covered = audit.map(r => r.getLong(1) * r.getLong(2)).sum
    assert(covered == totalChars, s"covered $covered != corpus $totalChars")
    val ppm = audit.map(_.getLong(4)).sum
    assert(ppm <= 1000000L && ppm > 1000000L - audit.length,
      s"char_ppm floor-sum out of range: $ppm")
  }

  test("frequency: merged-pair counts never exceed their q263 pair_count") {
    val byTok = audit.map(r => r.getString(0) -> r.getLong(2)).toMap
    merges.foreach { case (m, learnedCount) =>
      byTok.get(m).foreach { freq =>
        assert(freq <= learnedCount,
          s"'$m' audit freq $freq exceeds learned pair_count $learnedCount")
      }
    }
  }
}
