package graft

/** Pins q268's ≤2-corpus-scan property (round-14 verdict task 4): the
  * Misra–Gries pass carries the exact stream length in its buffer, so
  * the only corpus reads are (1) the sketch pass and (2) the exact
  * rescore — the r13 shape paid a third full tokenize for a bare
  * `count()`. The gate measures actual file-source rows read during
  * the query (task input metrics), not plan text: documents.parquet
  * has R rows, so >2R rows read means a third scan crept back in.
  * The counter is read after a full listener-bus drain (ScanMetrics)
  * — the former sleep-and-poll could be outrun by a stalled event
  * queue on a loaded box (round-14 ADVICE).
  */
class MgScanCountSpec extends SparkSpec {

  test("q268 reads the documents table at most twice") {
    val docRows = spark.read
      .parquet(s"$sf001/documents.parquet").count()
    val read = ScanMetrics.recordsReadDuring(spark) {
      SparkEntry.queries("q268_misra_gries")(spark, sf001).collect()
    }
    // exactly 2 corpus scans; small slack for metric rounding but far
    // below the 3R a third scan would add
    assert(read <= 2 * docRows + docRows / 2,
      s"q268 read $read input rows for a $docRows-row corpus — " +
        "more than 2 scans (did the total-count pass come back?)")
    assert(read >= 2 * docRows,
      s"q268 read $read rows < 2×$docRows — the rescore pass vanished?")
  }
}
