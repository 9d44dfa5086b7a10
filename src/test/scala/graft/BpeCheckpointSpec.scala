package graft

import graft.operators.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Closes the learn-once/apply-everywhere loop THROUGH the checkpoint
  * contract (round-14 verdict task 4): `bpeLearn` returns a
  * driver-side merge table, and a real pipeline persists that table
  * between the learn job and every later apply job (the q44
  * parquet-stage contract). This spec writes the merge table to
  * parquet, reads it back in a fresh DataFrame, rebuilds the ordered
  * merge list from the STORED rows, and proves the re-hydrated
  * tokenizer is byte-identical to applying the in-memory table — the
  * operator survives the stage boundary it was extracted to serve.
  */
class BpeCheckpointSpec extends SparkSpec {

  test("BPE merge table round-trips through parquet (learn → store → apply)") {
    import spark.implicits._
    val dict = TextOps.bpeDict(Tables.documentsWide(spark, sf001), "text")
      .persist()
    dict.count()
    try {
      val learned = TextOps.bpeLearn(dict, 6)
      assert(learned.nonEmpty, "fixture corpus must learn at least one merge")

      // ——— store: the persistable artifact is (step, pair, pair_count)
      val out = java.nio.file.Files
        .createTempDirectory("bpe_merge_table").toString
      learned.toDF("step", "pair", "pair_count")
        .repartition(1).write.mode("overwrite").parquet(out)

      // ——— reload in a FRESH frame; merge ORDER must come from the
      // stored step column, not from file layout
      val reloaded = spark.read.parquet(out)
        .orderBy(col("step"))
        .as[(Long, String, Long)].collect().toSeq // k rows, bounded
      assert(reloaded == learned,
        "merge table (steps, pairs, counts) must round-trip exactly")

      // ——— apply from the store vs apply from memory: same tokenizer
      val fromMemory = TextOps.bpeApply(dict, learned.map(_._2))
        .select(col("word"), col("cnt"), col("syms"))
      val fromStore = TextOps.bpeApply(dict, reloaded.map(_._2))
        .select(col("word"), col("cnt"), col("syms"))
      assert(fromMemory.exceptAll(fromStore).isEmpty &&
        fromStore.exceptAll(fromMemory).isEmpty,
        "re-hydrated merge table must tokenize identically")

      // ——— and the tokenizer actually merged something: at least one
      // word's symbol count dropped below its character count
      val mergedWords = fromStore
        .filter(size(col("syms")) < length(col("word"))).count()
      assert(mergedWords > 0,
        "stored merges must produce multi-char tokens on the fixture")
    } finally dict.unpersist()
  }
}
