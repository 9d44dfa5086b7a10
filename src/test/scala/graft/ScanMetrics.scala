package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftTestHooks
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shared input-rows-read harness for the scan-budget specs
  * (MgScanCountSpec, ScanBudgetSpec). Counts task input records —
  * which in Spark's metric model includes BOTH file-source rows and
  * re-reads of persisted/localCheckpointed blocks (a cache hit counts
  * its rows as task input) — so a budget written against it prices
  * every byte a query actually moves through an executor's input
  * path, not just the parquet scans. The listener bus is DRAINED
  * (GraftTestHooks) before the counter is read: task-end events post
  * asynchronously and any fixed sleep-based poll can be outrun on a
  * loaded box (round-14 ADVICE). */
object ScanMetrics {
  def recordsReadDuring(spark: SparkSession)(body: => Unit): Long = {
    val read = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      GraftTestHooks.drainListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    read.get
  }
}
