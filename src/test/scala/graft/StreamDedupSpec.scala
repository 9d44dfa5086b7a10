package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exact dedup (dropDuplicatesWithinWatermark): duplicates
  * within the watermark delay are suppressed across micro-batches;
  * key state is evicted once the watermark passes, so a re-arrival
  * far later is treated as new — that re-emission IS the bounded-state
  * contract, not a bug. */
class StreamDedupSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s:00")

  test("in- and cross-batch duplicates suppressed; state evicted after watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = EventStream.dedupStream(
      mem.toDF().toDF("ets", "fingerprint"), Seq("fingerprint"), delay = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_test").start()
    try {
      // batch 1: an in-batch duplicate of A
      mem.addData((ts("01:00"), "A"), (ts("01:01"), "A"), (ts("01:02"), "B"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate of A, still inside the delay
      mem.addData((ts("01:05"), "A"), (ts("01:06"), "C"))
      q.processAllAvailable()
      val early = spark.table("graft_dedup_test")
        .select("fingerprint").collect().map(_.getString(0)).sorted.toSeq
      assert(early === Seq("A", "B", "C"))

      // advance event time far past the delay → A's state evicted,
      // so a fresh A is NEW (bounded state, not corpus-wide memory)
      mem.addData((ts("05:00"), "D"))
      q.processAllAvailable()
      mem.addData((ts("05:01"), "A"))
      q.processAllAvailable()
      val after = spark.table("graft_dedup_test")
        .select("fingerprint").collect().map(_.getString(0)).sorted.toSeq
      assert(after === Seq("A", "A", "B", "C", "D"))
    } finally q.stop()
  }
}
