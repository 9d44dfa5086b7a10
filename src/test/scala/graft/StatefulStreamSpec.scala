package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** flatMapGroupsWithState sessionization: state must carry an open
  * session ACROSS micro-batches and close it on a later-batch gap. */
class StatefulStreamSpec extends SparkSpec {

  test("session spans micro-batches; gap in a later batch closes it") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)] // (user_id, ts_ns, value_c)
    val sessions = EventStream.sessionizeStateful(mem.toDS(), gapNs = 1800L * 1000000000L)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("graft_stateful_test").start()
    try {
      val s = 1000000000L // 1s in ns
      mem.addData((1L, 0L, 100L), (1L, 10 * s, 200L)) // batch 1: open session
      q.processAllAvailable()
      assert(spark.table("graft_stateful_test").count() === 0) // still open
      // batch 2: one more event in-session, then a 2h jump → closes it
      mem.addData((1L, 20 * s, 300L), (1L, 7200 * s, 7L))
      q.processAllAvailable()
      val closed = spark.table("graft_stateful_test")
        .as[EventStream.SessionOut].collect()
      assert(closed.length === 1)
      val c = closed.head
      assert(c.user_id === 1L && c.start_ns === 0L && c.end_ns === 20 * s)
      assert(c.n_events === 3L && c.sum_c === 600L) // state crossed batches
    } finally q.stop()
  }
}
