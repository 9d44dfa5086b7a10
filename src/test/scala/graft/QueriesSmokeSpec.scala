package graft

/** Every declared query runs at sf0.001 and (apart from known-empty
  * ones) returns rows; entry() satisfies the driver smoke check.
  * The same pass audits every physical plan for scale-killers that
  * are bugs at ANY data size: cartesian products and broadcast
  * nested-loop joins (a join that lost its equi-keys). */
class QueriesSmokeSpec extends SparkSpec {

  // q228's union sketch emits a pair row only once BOTH type sketches
  // are full (k = 64 distinct users) — at sf0.001 the per-type user
  // sets are smaller than k, so an empty result is the sketch
  // semantics, not a bug (the sf0.01/sf0.1 oracle runs pin 10 rows).
  // q241's corpus slice leaves ~30 docs at sf0.001 — zero qualifying
  // near-dup pairs there is the data, not a bug (oracled at sf0.01+).
  private val mayBeEmpty = Set("q08_customers_without_orders", "q228_kmv_sketch",
    "q241_prefix_simjoin")

  /** Queries where a broadcast nested-loop join is the DESIGN, not a
    * lost equi-key: q27 is the exact brute-force ANN baseline — every
    * (corpus row, broadcast query) pair must be scored by definition;
    * q88 is the same scan over int8-quantized codes (the memory-bound
    * lever, not a candidate-pruning one); their pruning scale paths
    * are the bucketed q43/q52/q69/q78. q85/q86 attach a 1-row global
    * aggregate (corpus size / avg doc length) as a broadcast cross
    * join — the scalar-subquery shape, one broadcast row per task;
    * q99 does the same with its one-row packed seed array (k=8
    * codebook candidates), assignment then being per-row array
    * algebra with no corpus shuffle. */
  /** name → MAX deliberate BNLJ count: the audit still fires if a
    * whitelisted query gains an EXTRA nested loop (an equi-keyed join
    * elsewhere in its plan losing its keys), which a plain
    * name-exemption would silently absorb. Counts above 1 come from
    * UN-CACHED SUBTREE DUPLICATION, not from extra joins: a DataFrame
    * referenced k times inlines its subtree — and the 1-row broadcast
    * join inside it — k times (e.g. q141's `assigned` feeds the pair
    * join's both sides plus the final verdict = 3 copies of the seed
    * crossJoin). Cheap for 1-row broadcasts, and pinning the exact
    * count means an accidental extra reference shows up here too. */
  private val deliberateNestedLoop = Map(
    "q27_cosine_topk" -> 1, "q88_quantized_ann" -> 1,
    "q85_tfidf_topk" -> 1, "q86_bm25" -> 1,
    "q99_kmeans_iter" -> 1,
    // q131 composes q27's exact brute-force baseline — the exact side
    // of a recall audit is a full scan by definition (×2: exactTopK
    // feeds the hit join and the qid spine); its pruned side (IVF)
    // plans hash joins only.
    "q131_ann_recall" -> 2,
    // q141's seed assignment is q99's 1-row broadcast codebook
    // (its pair join is cluster_id-keyed hash; the assignment subtree
    // is referenced 3×); q142 is q27's broadcast-queries scan with
    // the label inequality riding the join condition; q145 attaches
    // two 1-row aggregates (total score ×2 references, spare slots)
    // to lang-cardinality rows — the q85/q86 scalar-subquery shape.
    "q141_semdedup" -> 3, "q142_hard_negatives" -> 1,
    "q145_temperature_mix" -> 3,
    // q150's min-class-size is a 1-row broadcast scalar.
    "q150_label_balance" -> 1,
    // q230 attaches the 1-row digit-count total — the q85/q86 scalar
    // shape; the expected-ppm join is digit-keyed hash.
    "q230_benford_audit" -> 1,
    // q232 scans the 320-row broadcast hash RING per key — O(vnodes)
    // per key by design, the q228 bounded-small-side shape; the dist
    // subtree is referenced by both ring assignments (before ×1,
    // after ×1) and each inlines the ring build's 5×64 range cross
    // (×2) → 4 bounded nested loops, zero over the key set itself.
    "q232_consistent_hashing" -> 4,
    // q233 attaches the 1-row stratum-mass total — the scalar shape.
    "q233_quota_allocation" -> 1,
    // q239 attaches the 1-row world total — the scalar shape; the
    // nation/region shares themselves are equi-keyed hash joins.
    "q239_ratio_to_parent" -> 1,
    // q255's scored frame attaches the 1-row broadcast query vector
    // (the q27/q88 single-query scan); referenced by BOTH top-10 legs
    // (exact + projected) → the subtree inlines twice.
    "q255_random_projection" -> 2,
    // q256 attaches the 1-row exact-F2 scalar — the q85/q86 shape.
    "q256_ams_f2" -> 1,
    // q253's semantic leg attaches the 1-row broadcast query vector
    // (the q27/q88 broadcast-queries scan with exactly one query);
    // the RRF fusion join is doc_id-keyed hash over 20∪20 rows.
    "q253_hybrid_rrf" -> 1,
    // q254 attaches the 1-row part-count scalar to the anchor set —
    // the q85/q86 scalar shape; the positives anti join is
    // (custkey, partkey)-keyed hash.
    "q254_negative_sampling" -> 1,
    // q228 pairs each type's 64-row KMV sketch with the ~5-row type
    // list to build union sketches — both sides are O(k·types)
    // sketch-sized by construction (never the events table), the
    // exact point of shipping sketches; the exact-intersection join
    // itself is user_id-keyed hash.
    "q228_kmv_sketch" -> 2,
    // q147's df cap compares against a 1-row corpus count — the same
    // scalar shape, inlined into the 4 references of the capped
    // postings; its postings/norm joins must stay hash.
    "q147_sparse_docsim" -> 4,
    // q155's exact-threshold gate compares candidate counts against
    // the 1-row corpus token total — the q85/q86 scalar shape; the
    // candidate and recount joins themselves must stay hash.
    "q155_heavy_hitters" -> 1,
    // q172 attaches two 1-row scalars (global totals + the peak
    // |cusum|) to the tiny per-day series; the cusum'd subtree is
    // referenced by both the max branch and the final projection, so
    // the totals cross join inlines twice (2) plus the max attach (1).
    "q172_cusum_changepoint" -> 3,
    // q127's ntile rewrite attaches the 1-row global count to the
    // ranked rows for the closed-form bucket — the q85/q86 broadcast
    // scalar shape.
    "q127_equidepth_histogram" -> 1,
    // q188's total-token count is a 1-row broadcast scalar attached
    // to the min-support bigram survivors — the q85/q86 shape.
    "q188_collocation_lift" -> 1,
    // q208 attaches the 1-row half-totals aggregate to the ≤24-row
    // bucket table — the q85/q86 scalar shape; the halves themselves
    // are one hash agg.
    "q208_drift_audit" -> 1,
    // q267 attaches the 1-row max-score normalizer to the scored docs
    // — the q85/q86 scalar shape; the model join is b-keyed hash.
    // Exactly 1 again (round-14 verdict task 8): the tree walk counts
    // the executed adaptive plan once, so the Final+Initial
    // double-print that forced a budget of 2 is gone.
    "q267_dsir_resample" -> 1,
    // q269's lang×lang pair spine crosses the ≤|langs|-row totals
    // aggregate with itself so zero-shared-vocabulary pairs still
    // emit (TV = 1) — bounded-agg × bounded-agg; the corpus-sized
    // work stays on the word-keyed inner hash join.
    "q269_tv_drift" -> 1,
    // q273 attaches the 1-row max-x bucketing boundary — the q85/q86
    // scalar shape; the bucketed subtree is referenced twice (the
    // 64-row threshold build + the final filter) so it inlines ×2.
    "q273_pareto_frontier" -> 2,
    // q275 attaches the 1-row leakage-count scalar to the ≤3-row
    // split rollup — the q85/q86 scalar shape; the candidate and
    // component joins themselves are banded/keyed hash.
    "q275_leakage_split" -> 1)

  /** name → (MAX broadcast hints WITHOUT a structural bound proof,
    * the written bound) — round-14 verdict task 3: the q173 cliff
    * class (a `broadcast()` hint over a frame that grows with the
    * fact tables) found by hand-sweeping ~40 sites, now a gate.
    * [[BroadcastHintAudit]] proves most hint subtrees bounded
    * structurally (limits, 1-row/bounded-key aggregates, dimension
    * leaves, joins of bounded things); what it cannot prove needs an
    * entry HERE with the bound argued in words. A hint over a
    * lineitem/documents/events-derived frame with no entry fails the
    * suite. (The round-15 audit also REMOVED the hints this gate
    * would have flagged as genuinely unbounded: q04's part table,
    * q185's per-part count attachments, q86→covered by isin, q144/
    * q252/TextOps' benchmark gram tables — those now rely on AQE's
    * runtime-stat broadcasts, which degrade gracefully at scale.) */
  private val deliberateUnprovenBroadcast: Map[String, (Int, String)] = Map(
    "q15_average_precision" -> (3, "two-phase AP offs/tails: (group × " +
      "bucket) grids where group = event_type (5 by generator) and the " +
      "bucket grid is the fixed ≤65-entry boundsHint (Eval.scala) — " +
      "≤325 rows however large the score table"),
    "q71_ava_eval_e2e" -> (3, "the same two-phase AP grids keyed by the " +
      "AVA eval group — the benchmark label space (entities in the eval " +
      "set), bounded by the eval-suite contract, not by corpus volume"),
    "q27_cosine_topk" -> (1, "ANN probe set: the benchmark query " +
      "workload (fixture: vec_id % 50 slice); a production workload is " +
      "k queries by contract — the corpus side never moves " +
      "(SimilarityBoundSpec pins that)"),
    "q43_ann_topk" -> (1, "ANN probe set — same bound as q27"),
    "q52_ivf_topk" -> (1, "ANN probe set — same bound as q27"),
    "q69_ivf_nprobe" -> (1, "ANN probe set — same bound as q27"),
    "q88_quantized_ann" -> (1, "ANN probe set — same bound as q27"),
    "q142_hard_negatives" -> (1, "ANN probe set — same bound as q27"),
    "q131_ann_recall" -> (3, "ANN probe set (q27's) referenced by the " +
      "exact leg, the IVF leg, and the recall join — 3 inlined copies"),
    "q253_hybrid_rrf" -> (1, "single query vector: vec_id = 0 literal " +
      "equality — exactly 1 row"),
    "q255_random_projection" -> (2, "single query vector (vec_id = 0), " +
      "inlined by both the exact and the projected top-k legs"),
    "q44_pipeline_e2e" -> (1, "keptScenes = the batch's shot list; the " +
      "reference pipeline (demoTalkNet) processes one video batch per " +
      "run — shots-per-batch bounded, not corpus-bounded"),
    "q259_dynamic_pruning" -> (1, "the pruning dim is the batch's scene " +
      "list — same per-batch bound as q44"),
    "q86_bm25" -> (1, "dfreq groups by word AFTER isin(4 literal query " +
      "terms) — ≤4 rows by the filter's literal domain"),
    "q87_colocated_join" -> (1, "the segment lookup maps the 5-value " +
      "event_type domain — ≤5 rows"),
    "q119_mad_outlier" -> (1, "Aggregate [lang, med]: med is the " +
      "per-lang median (functionally dependent on lang) — ≤|langs| rows"),
    "q155_heavy_hitters" -> (1, "candidates = words with cnt·k > N: at " +
      "most k−1 items can exceed N/k, by counting"),
    "q273_pareto_frontier" -> (1, "thr groups by bucket = least(63, " +
      "n_events * 64 DIV (max_x + 1)) — both operands are non-negative " +
      "counts, so the ratio is ≥ 0 and the least() caps it at 63: ≤64 " +
      "rows by construction (the structural prover rejects least() " +
      "because it bounds only one side; the non-negativity argument " +
      "lives here instead)"))

  /** name → MAX deliberate shrinking-frame count. A window frame
    * whose LOWER bound is not UNBOUNDED PRECEDING but whose UPPER
    * bound is UNBOUNDED FOLLOWING is executed by Spark's
    * UnboundedFollowingWindowFunctionFrame, which recomputes the
    * aggregate from the current row to the partition end FOR EVERY
    * ROW — O(n²) per partition (measured 3× on q236 before its
    * rewrite; a 1M-row partition gets a 10¹²-op task). Every such
    * site has an O(n) rewrite: reverse the sort and use the growing
    * `unboundedPreceding..currentRow` frame (Eval.scala:65–68,
    * q211/q236/q166). Empty today — additions need a written
    * rationale like the BNLJ map above. */
  private val deliberateShrinkingFrame = Map.empty[String, Int]

  /** name → MAX deliberate UNPARTITIONED-window count (round-11
    * verdict task 6). A Window with an empty partitionSpec executes
    * on ONE task — "No Partition Defined for Window operation" in the
    * bench tail — which is a scale cliff unless the input is provably
    * tiny (a final rank over an already-aggregated handful of rows).
    * Every entry here needs the rationale that bounds the input;
    * anything NEW fails the smoke audit. The scalable alternatives:
    * partition the window by a real key, or for a global top-k use
    * orderBy(...).limit(k) (TakeOrderedAndProject — per-partition
    * top-k then a k-row driver merge, q05/q15's two-phase shape). */
  private val deliberateGlobalWindow: Map[String, Int] = Map(
    // q127's full-table ntile is rewritten onto Enumerate
    // .globalRowNumber + a closed-form bucket (no entry needed);
    // q188/q205's vocabulary-sized ranks are limit-first now. What
    // remains is rank/cumsum windows over inputs ALREADY bounded by
    // an upstream aggregate or TakeOrdered limit:
    "q86_bm25" -> 1, // rank over the ≤20 rows a TakeOrdered(20) kept
    "q145_temperature_mix" -> 1, // largest-remainder rank over ≤|langs| rows
    // q172's input is aggregated to ONE ROW PER CALENDAR DAY before
    // either window — cardinality grows with the time span (~365/yr),
    // never with data volume, so a 100 TB year is still ≤366 rows;
    // the cusum recurrence is inherently sequential over that series
    "q172_cusum_changepoint" -> 2,
    "q177_top_paths" -> 1, // rank over distinct 3-type paths (≤|types|³ = 125)
    "q188_collocation_lift" -> 1, // rank over the ≤50 rows a TakeOrdered(50) kept
    "q205_countmin" -> 1, // rank over the ≤20 rows a TakeOrdered(20) kept
    "q209_vocab_growth" -> 1, // cumulative sums over the 10 decile rows
    // q231's carry runs over one row per CALENDAR HOUR (≤8784/yr —
    // time-span-bounded like q172, independent of data volume) after
    // the corpus-sized work aggregated per hour in parallel
    "q231_peak_concurrency" -> 1,
    "q233_quota_allocation" -> 2, // largest-remainder ranks over ≤|langs| rows
    "q253_hybrid_rrf" -> 2, // per-leg rank over the ≤20 rows each TakeOrdered kept
    "q255_random_projection" -> 1, // rank over the 10-row exact top-k
    "q264_lang_upsample" -> 1, // t_max carried on the ≤|langs|-row histogram (q145 shape)
    "q266_bpe_tokenize" -> 1, // char-coverage total over the ≤32-row token vocab
    // q267's model totals run over the ≤128-row bucket agg (q145
    // shape); the scored subtree holding that window is referenced
    // twice (max-score scalar + the resample) so it inlines ×2 —
    // the same un-cached subtree duplication the BNLJ counts pin.
    "q267_dsir_resample" -> 2,
    "q272_curriculum_interleave" -> 1, // pos stamp over the ≤40 rows a TakeOrdered(40) kept
    "q273_pareto_frontier" -> 1) // cross-bucket prefix max over the ≤64-row bucket table

  // The lower-bound capture is comma-free so the match can never span
  // out of one frame's argument list into a later frame (a `.*?`
  // here false-positived on q50's bounded (RowFrame, 1, 1) frame by
  // bridging to an unrelated whole-partition frame downstream).
  private val shrinkingFrame =
    """specifiedwindowframe\((?:Row|Range)Frame, ([^,]+), unboundedfollowing\$\(\)\)""".r

  /** Count BNLJ nodes by WALKING the physical tree instead of
    * grepping its string (round-14 verdict task 8): an executed
    * AdaptiveSparkPlan prints BOTH its Final and Initial trees, so a
    * pinned (persist-then-count) query's one deliberate BNLJ appeared
    * twice in the string and the budget had to absorb the echo. The
    * walk descends into the adaptive plan's CURRENT tree exactly once
    * and into cached-relation plans at every scan site — so
    * deliberate per-reference subtree inlining still counts per
    * reference (the q141/q232 entries), while the AQE double-print
    * cannot inflate anything. */
  private def bnljCount(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val self = p match {
      case _: BroadcastNestedLoopJoinExec => 1
      case _ => 0
    }
    val nested = p match {
      case a: AdaptiveSparkPlanExec => bnljCount(a.executedPlan)
      case s: InMemoryTableScanExec => bnljCount(s.relation.cachedPlan)
      case _ => 0
    }
    self + nested + p.children.map(bnljCount).sum +
      p.subqueries.map(bnljCount).sum
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 with a sane plan") {
      val df = fn(spark, sf001)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      val bnlj = bnljCount(df.queryExecution.executedPlan)
      val allowed = deliberateNestedLoop.getOrElse(name, 0)
      assert(bnlj <= allowed,
        s"$name plans $bnlj nested-loop joins (allowed $allowed — equi-keys lost?)")
      val shrinking = shrinkingFrame.findAllMatchIn(plan).map(_.group(1))
        .filterNot(_ == "unboundedpreceding$()").toList
      val allowedShrink = deliberateShrinkingFrame.getOrElse(name, 0)
      assert(shrinking.size <= allowedShrink,
        s"$name plans ${shrinking.size} shrinking window frame(s) " +
          s"(lower bounds $shrinking ..UNBOUNDED FOLLOWING — O(n²) per " +
          "partition; rewrite to the reversed-sort growing frame, Eval.scala:65)")
      // the logical plan is traversed (not the executed-plan string):
      // AQE wraps the physical tree in AdaptiveSparkPlanExec, which
      // plain collect() does not descend into
      val globalWindows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.size
      val allowedGlobal = deliberateGlobalWindow.getOrElse(name, 0)
      assert(globalWindows <= allowedGlobal,
        s"$name plans $globalWindows unpartitioned Window(s) (allowed " +
          s"$allowedGlobal) — single-task execution; partition the window " +
          "or use orderBy().limit(k), else whitelist with a written " +
          "input-size rationale in deliberateGlobalWindow")
      val unproven = BroadcastHintAudit.unprovenHints(df.queryExecution.analyzed)
      val (allowedHints, bound) =
        deliberateUnprovenBroadcast.getOrElse(name, (0, "<none>"))
      assert(unproven.size <= allowedHints,
        s"$name hints broadcast over ${unproven.size} subtree(s) without a " +
          s"structural bound proof (allowed $allowedHints; written bound: " +
          s"$bound). A hint forces a driver-side build at ANY size — the " +
          "q173 cliff class. Either the frame is bounded by construction " +
          "(add the written bound to deliberateUnprovenBroadcast) or the " +
          "hint must go (AQE broadcasts from runtime stats while small). " +
          "First offender:\n" +
          unproven.headOption.map(_.child.treeString.take(600)).getOrElse(""))
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
