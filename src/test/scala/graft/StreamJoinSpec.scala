package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join semantics (the q76 operator shape):
  * matches across micro-batches while state lives; the event-time
  * range condition + watermark let Spark evict buffered rows, so a
  * view arriving after the watermark has passed its join window finds
  * no click state — bounded state IS the contract on an unbounded
  * source (a batch join over the same rows would still match). */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s:00")

  test("cross-batch range matches emit; state evicted past the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val views = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val c = clicks.toDF().toDF("cets", "c_uid", "click_id")
      .withWatermark("cets", "10 minutes")
    val v = views.toDF().toDF("vets", "v_uid", "view_id")
      .withWatermark("vets", "10 minutes")
    val joined = c.join(v,
      col("c_uid") === col("v_uid") &&
        col("vets") >= col("cets") - expr("INTERVAL 30 MINUTES") &&
        col("vets") <= col("cets"))
      .select(col("click_id"), col("view_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_join_test").start()
    try {
      def rows() = spark.table("graft_join_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      // view arrives in batch 1, matching click only in batch 2:
      // the buffered view state must still be there
      views.addData((ts("01:00"), 7L, 100L))
      q.processAllAvailable()
      clicks.addData((ts("01:10"), 7L, 200L))
      q.processAllAvailable()
      assert(rows() === Seq((200L, 100L)))

      // same-batch in-window and out-of-window views: only the
      // in-window one joins (range predicate, not just key equality)
      clicks.addData((ts("02:00"), 8L, 201L))
      views.addData((ts("01:50"), 8L, 101L), (ts("01:20"), 8L, 102L))
      q.processAllAvailable()
      assert(rows() === Seq((200L, 100L), (201L, 101L)))

      // advance BOTH watermarks far ahead, then send a view whose join
      // window lies entirely before the watermark: the old clicks'
      // state is gone and no pair emits — eviction, not a missed match
      clicks.addData((ts("09:00"), 9L, 300L))
      views.addData((ts("09:00"), 9L, 300L))
      q.processAllAvailable()
      views.addData((ts("02:05"), 8L, 103L)) // would match click 201 in batch terms
      q.processAllAvailable()
      assert(rows() === Seq((200L, 100L), (201L, 101L), (300L, 300L)))
    } finally q.stop()
  }
}
