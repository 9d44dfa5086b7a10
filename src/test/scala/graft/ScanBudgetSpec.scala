package graft

/** Input-rows scan budgets for the multi-pass corpus queries
  * (round-14 verdict task 5 — MgScanCountSpec's task-input-metrics
  * gate generalized). Each row pins how many input rows a query may
  * move through the executors' input path on the sf0.001 fixture,
  * in units of the documents row count R. What the metric counts,
  * established empirically on this box (two identical probe runs):
  *
  *  - every FILE scan of documents.parquet adds exactly R;
  *  - re-reads of MEMORY-cached frames are NOT input records (q267's
  *    pinned per-doc frame is read twice downstream and adds ~0);
  *  - localCheckpoint partitions and iterative-loop block re-reads DO
  *    count (q77's component loop), deterministically for fixed data
  *    and shuffle-partition config.
  *
  * So the budget is a regression tripwire priced in corpus scans: a
  * re-introduced extra pass adds +1.0R — every ceiling below sits
  * ≤0.5R above the measured value. The LOWER bound pins the intended
  * scan structure too: if a change legitimately removes a pass, the
  * bound fails and the budget (and the query's scale comment) must be
  * updated together, consciously.
  */
class ScanBudgetSpec extends SparkSpec {

  /** (query, minScans, maxScans, rationale) — bounds in units of R. */
  private val budgets = Seq(
    ("q267_dsir_resample", 2.0, 2.5,
      "two corpus scans BY DESIGN: (1) the hashed-unigram model fit " +
        "(one agg over the token stream), (2) the rescore join of the " +
        "same stream against the broadcast model. The per-doc scored " +
        "frame is pinned and its two consumers (max normalizer + " +
        "resample) read memory, not input. Measured 2.03R."),
    ("q269_tv_drift", 1.0, 1.5,
      "ONE corpus scan: the (lang, word) dict agg is persisted and " +
        "every downstream read (totals, both pair-join sides, spine) " +
        "is a cache hit. Measured 1.06R."),
    ("q276_bpe_fertility", 1.0, 1.5,
      "ONE corpus scan pins the per-lang dict; the global roll-up, " +
        "the 6-iteration learn loop (its own dict-sized gen caches), " +
        "and the apply all derive from caches. Measured 1.19R."),
    ("q266_bpe_tokenize", 1.0, 1.5,
      "ONE corpus scan pins the dict; learn's gen 0 reuses the " +
        "caller's cache (TextOps.bpeLearn ownsStates guard) and the " +
        "apply audit reads the same pin. Measured 1.16R."),
    ("q77_corpus_clean", 14.0, 15.75,
      "four corpus TEXT scans by design (word-count agg, the gates " +
        "stop-word scan, the fps text re-join, the surv2 text re-join " +
        "+ LSH re-scan of unpersisted surv2 lineage) plus the " +
        "deterministic localCheckpoint/component-loop block re-reads " +
        "that the input metric prices; measured 15.25R on the " +
        "fixture. The checkpoint re-reads are per-doc SCALARS (the " +
        "scale comment in DomainQueries) — rows, not text bytes — so " +
        "the gate is about pass count, and one added corpus scan " +
        "(+1.0R) trips the 0.5R headroom."),
    ("q261_decon_compose", 4.5, 5.5,
      "FIVE corpus scans: the compose pipeline deliberately re-derives " +
        "its unpersisted fp/reps lineage (fp for the group agg, fp for " +
        "the rep join, the benchmark side of the union, the gram/bloom " +
        "stage, the final n_copies attach) instead of pinning corpus " +
        "text in the block manager — scan cost is the 100 TB trade " +
        "the operator documents. Measured exactly 5.00R."),
    ("q275_leakage_split", 7.0, 8.29,
      "MinHash shingle scan feeds the banded candidate build, the " +
        "node-id list is its own scan, the q72 component loop prices " +
        "its deterministic localCheckpoint block re-reads, and the " +
        "CHECKPOINTED assignment is what the leak audit + split " +
        "rollup both read — MinHash itself never re-runs (the " +
        "operator's stated contract). Measured 7.79R; one extra " +
        "corpus pass (+1.0R) trips the 0.5R headroom."),
    ("q200_fuzzy_clusters", 4.5, 5.82,
      "q196's blocked pair join reads corpus text on BOTH self-join " +
        "sides (unpersisted lineage, by the q261 don't-pin-text " +
        "policy), the component node list adds one scan, and the " +
        "q72 loop's localCheckpoint re-reads price the rest. " +
        "Measured 5.32R."),
    ("q210_canonical_pick", 5.5, 6.82,
      "q200's structure plus exactly ONE more corpus scan: the " +
        "(doc_id, n_chars) attach that sizes each cluster for the " +
        "canonical max_by pick. Measured 6.32R = q200's 5.32R + " +
        "1.00R, pinning that the pick stage re-reads metadata " +
        "columns once, never text twice."),
    ("q244_dedup_compose", 1.9, 2.5,
      "TWO corpus text scans by design: the md5 fingerprint agg and " +
        "the representative re-join each re-derive the unpersisted " +
        "fp lineage; the blocked pair join's a/b sides then reuse " +
        "the one shuffled reps exchange, so blocking never touches " +
        "text again. Measured exactly 2.00R."))

  test("multi-pass corpus queries stay inside their scan budgets") {
    val docRows = spark.read.parquet(s"$sf001/documents.parquet").count()
    val failures = budgets.flatMap { case (q, lo, hi, why) =>
      val read = ScanMetrics.recordsReadDuring(spark) {
        SparkEntry.queries(q)(spark, sf001).collect()
      }
      val r = read.toDouble / docRows
      info(f"$q%-22s $r%5.2fR (budget [$lo, $hi]) read=$read")
      if (r > hi) Some(f"$q read $r%.2fR > budget ${hi}R — an extra corpus " +
        s"pass crept in. Intended structure: $why")
      else if (r < lo) Some(f"$q read $r%.2fR < lower bound ${lo}R — a pass " +
        s"vanished; if deliberate, update the budget AND the query's scale " +
        s"comment. Intended structure: $why")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
