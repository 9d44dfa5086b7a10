package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked append-mode windowed aggregation: a window emits
  * exactly once (when the watermark passes its end) and events behind
  * the watermark are dropped. */
class WatermarkSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s:00")

  test("window finalizes after watermark passes; late data is dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    val agg = EventStream.windowedCounts(
      mem.toDF().toDF("ets", "event_type", "value_c"), delay = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("graft_wm_test").start()
    try {
      mem.addData((ts("01:10"), "a", 1L), (ts("01:20"), "a", 2L))
      q.processAllAvailable()
      // watermark still inside hour 01 → nothing finalized
      assert(spark.table("graft_wm_test").count() === 0)

      // jump event time to 03:30 → watermark 03:20 > 02:00
      mem.addData((ts("03:30"), "a", 5L))
      q.processAllAvailable()
      // a straggler BEHIND the watermark: must be dropped, and this
      // batch also flushes the finalized hour-01 window
      mem.addData((ts("01:40"), "a", 99L))
      q.processAllAvailable()

      val rows = spark.table("graft_wm_test")
        .select("hour_start", "n", "sum_c").collect()
      val h1 = rows.find(_.getString(0) == "2026-01-01 01:00:00")
      assert(h1.isDefined, s"hour-01 window not emitted: ${rows.mkString(",")}")
      assert(h1.get.getLong(1) === 2L && h1.get.getLong(2) === 3L,
        "late 01:40 event must NOT be counted")
    } finally q.stop()
  }
}
