package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Pins q268's ≤2-corpus-scan property (round-14 verdict task 4): the
  * Misra–Gries pass carries the exact stream length in its buffer, so
  * the only corpus reads are (1) the sketch pass and (2) the exact
  * rescore — the r13 shape paid a third full tokenize for a bare
  * `count()`. The gate measures actual file-source rows read during
  * the query (task input metrics), not plan text: documents.parquet
  * has R rows, so >2R rows read means a third scan crept back in.
  */
class MgScanCountSpec extends SparkSpec {

  test("q268 reads the documents table at most twice") {
    val docRows = spark.read
      .parquet(s"$sf001/documents.parquet").count()
    val read = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("q268_misra_gries")(spark, sf001).collect()
      // task-end events post asynchronously — poll until the counter
      // is stable rather than reaching into the private listener bus
      var prev = -1L
      var spins = 0
      while (read.get != prev && spins < 50) {
        prev = read.get
        Thread.sleep(100)
        spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // exactly 2 corpus scans; small slack for metric rounding but far
    // below the 3R a third scan would add
    assert(read.get <= 2 * docRows + docRows / 2,
      s"q268 read ${read.get} input rows for a $docRows-row corpus — " +
        "more than 2 scans (did the total-count pass come back?)")
    assert(read.get >= 2 * docRows,
      s"q268 read ${read.get} rows < 2×$docRows — the rescore pass vanished?")
  }
}
