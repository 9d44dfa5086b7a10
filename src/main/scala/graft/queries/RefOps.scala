package graft.queries

import graft.functions.RollingHash
import graft.operators.{BatchPack, Eval, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second reference-domain pack: the remaining SURVEY §2 operators —
  * trial-list text roundtrip (§2.1 scans), the 29.97→25 fps label
  * remap join (demoTalkNet.py:384–393), greedy dynamic batch packing
  * (dataLoader.py:94–104), deterministic train/test split
  * (TalkSet/generate_TalkSet.py:375–391, hash in place of seeded
  * shuffle so the oracle can reproduce it), the noise-pairing join +
  * wrap-pad + SNR mixing math (dataLoader.py:15–28), centisecond
  * truncation + printf formatting (generate_TalkSet.py:66;
  * demoTalkNet.py:527), the 1:1-validated merge + bbox tolerance
  * audit (get_ava_active_speaker_performance.py:94–142), and IVF ANN
  * (oracled; the codebook path of the similarity extension).
  */
object RefOps extends QueryPack {
  import Q._

  /** Dense per-user frame index from events (row_number per user). */
  private def frames(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("frame2997", (row_number().over(w) - 1).cast("long"))
      .select(col("user_id"), col("frame2997"), col("value"), col("event_id"))
  }

  val queries = Map[String, Fn](
    // Trial-list text source roundtrip: format rows as space-separated
    // lines (the TalkSet/AVA list shape), write .text, scan with
    // read.text + split + element_at, aggregate — covers the text
    // sink/scan + positional-parse surface (dataLoader.py:94–108).
    "q46_trial_roundtrip" -> { (s, dir) =>
      val tmp = scratchDir(s, "graft_trial") + "/lines"
      Tables.table(s, dir, "orders")
        .select(format_string("%d\t%d\t%s\t%d",
          col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          cents(col("o_totalprice").cast("double"))).as("value"))
        .write.mode("overwrite").text(tmp)
      val parts = split(col("value"), "\t")
      s.read.text(tmp)
        .select(
          element_at(parts, 1).cast("long").as("o_orderkey"),
          element_at(parts, 2).cast("long").as("o_custkey"),
          element_at(parts, 3).as("priority"),
          element_at(parts, 4).cast("long").as("price_c"))
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("cust_sum"),
          sum(col("price_c")).as("price_c_sum"))
        .orderBy(col("priority"))
    },

    // GT label frame-rate remap + exact equi-join lookup: frames at
    // "29.97 fps" remap via int(f/29.97*25) (demoTalkNet.py:384);
    // collisions keep all rows (the reference appends to dictGT[frame],
    // :390–393); join back to the dense 25 fps index.
    "q47_frame_remap" -> { (s, dir) =>
      val e = frames(s, dir)
      val gt = e.select(col("user_id"),
        floor(col("frame2997") / lit(29.97) * lit(25)).cast("long").as("frame"))
      val pred = e.select(col("user_id"), col("frame2997").as("frame"),
        cents(col("value")).as("score_c"))
      gt.join(pred, Seq("user_id", "frame"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matched"), sum(col("score_c")).as("score_c_sum"))
        .orderBy(col("user_id"))
    },

    // Greedy length-sorted batch packing (dataLoader.py:94–104); the
    // oracle replays the same sequential slicing as a recursive CTE.
    "q48_batch_pack" -> { (s, dir) =>
      val items = Tables.table(s, dir, "orders").select(
        col("o_orderpriority").as("cat"), col("o_orderkey").as("id"),
        (col("o_orderkey") % 180 + 20).cast("long").as("len"))
      BatchPack.pack(s, items, batchSize = 2500L)
        .select(col("cat"), col("batch_id"), col("id"), col("len"))
        .orderBy(col("cat"), col("batch_id"), col("len").desc, col("id").desc)
    },

    // Train/test split + union: the reference shuffles then takes
    // `num % 30000 < 27000` (generate_TalkSet.py:375–391). Seeded
    // shuffle isn't reproducible across engines, so the deterministic
    // stand-in is a content-hash split (rolling_hash % 10) — same
    // 90/10 contract, oracle-checkable, and stable under reruns.
    "q49_split_hash" -> { (s, dir) =>
      RollingHash.register(s)
      val docs = Tables.table(s, dir, "documents")
        .withColumn("h", expr("rolling_hash(text)"))
      val train = docs.filter(col("h") % 10 < 9).withColumn("split", lit("train"))
      val test = docs.filter(col("h") % 10 >= 9).withColumn("split", lit("test"))
      train.unionByName(test)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("h_sum"))
        .orderBy(col("split"))
    },

    // Noise-pairing join + wrap-pad + SNR mixing (dataLoader.py:15–28):
    // partner = next vec_id in the same label block (wrapping — a
    // deterministic "different key from the same pool"), noise clip
    // wrap-padded from 32 to 48 samples (numpy.pad 'wrap'), dB + mix
    // weight per the reference formulas, snr = (vec_id % 11) - 5 in
    // place of uniform(-5,5).
    "q50_noise_pair_mix" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // partner pick stays relational (windows); the per-row DSP math
      // is a typed kernel — in the reference it IS kernel code
      // (dataLoader.py:15–28), and Spark's higher-order array folds
      // are interpreted + get inlined once per referencing column,
      // so the kernel is both faithful and ~10× cheaper per row.
      Tables.table(s, dir, "embeddings")
        .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
        .withColumn("partner_id", coalesce(lead(col("vec_id"), 1).over(w),
          first(col("vec_id")).over(wAll)))
        .withColumn("pv", coalesce(lead(col("vd"), 1).over(w),
          first(col("vd")).over(wAll)))
        .filter(col("partner_id") =!= col("vec_id"))
        .select(col("vec_id").cast("long"), col("partner_id").cast("long"),
          col("vd"), col("pv"))
        .as[(Long, Long, Seq[Double], Seq[Double])]
        .mapPartitions(_.map { case (id, pid, vd, pv) =>
          val clean = vd.take(48).toArray
          val pv32 = pv.take(32).toArray
          val noise = Array.tabulate(48)(i => pv32(i % 32)) // numpy.pad 'wrap'
          def db(a: Array[Double]): Double = {
            var acc = 0.0; var i = 0
            while (i < a.length) { acc += a(i) * a(i); i += 1 }
            10.0 * math.log10(acc / 48 + 1e-4)
          }
          val cleanDb = db(clean); val noiseDb = db(noise)
          val snr = (id % 11 - 5).toDouble
          val wt = math.sqrt(math.pow(10.0, (cleanDb - noiseDb - snr) / 10))
          (id, pid, cleanDb, noiseDb, wt, clean(0) + wt * noise(0))
        })
        .toDF("vec_id", "partner_id", "clean_db0", "noise_db0", "wt0", "mixed00")
        .select(col("vec_id"), col("partner_id"),
          round(col("clean_db0"), 6).as("clean_db"),
          round(col("noise_db0"), 6).as("noise_db"),
          round(col("wt0"), 6).as("wt"), round(col("mixed00"), 6).as("mixed0"))
        .orderBy(col("vec_id"))
    },

    // Centisecond truncation int(x*100)/100 (generate_TalkSet.py:66)
    // + %05d/%06d/%.2f formatting (demoTalkNet.py:527, 305). The
    // strings are built with codegen'd lpad/concat, printf-equivalent
    // for these nonneg fields — java.util.Formatter (format_string)
    // costs ~30 µs/row, which at 100 TB is the whole budget; the
    // format_string surface itself is exercised in q46/q55.
    "q51_format_trunc" -> { (s, dir) =>
      val c = floor(col("o_totalprice").cast("double") / 7 * 100).cast("long")
      def pad(x: org.apache.spark.sql.Column, n: Int) =
        lpad(x.cast("string"), n, "0")
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
          (c.cast("double") / 100).as("trunc_cs"),
          concat(pad(col("o_orderkey") % 100000, 5), lit("_"),
            pad((col("o_orderkey") * 31) % 1000000, 6)).as("fname"),
          concat(floor(c / 100).cast("long").cast("string"), lit("."),
            pad(c % 100, 2)).as("price_str"))
        .orderBy(col("o_orderkey"))
    },

    // Single-pass AP via the typed Aggregator (same numbers as q15's
    // window plan — the oracle is q15's, regrouped).
    "q56_ap_aggregator" -> { (s, dir) =>
      val apUdaf = udaf(graft.functions.ApAggregator,
        org.apache.spark.sql.Encoders.product[graft.functions.ApIn])
      Tables.events(s, dir)
        .withColumn("value_c", cents(col("value")))
        .withColumn("label", (col("event_id") % 2).cast("long"))
        .groupBy(col("event_type"))
        .agg(apUdaf(col("value_c"), col("label"), col("event_id")).as("ap"),
          sum(col("label")).as("n_pos"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Embedding-cosine near-duplicate pairs (the dedup-family member
    // over vectors): exact cosine >= 0.2 within label blocks — at
    // corpus scale the block key comes from LSH buckets (q43) instead
    // of labels; the pair plan is identical.
    "q57_embedding_neardup" -> { (s, dir) =>
      import s.implicits._
      // blocked pair scoring as a per-block partition kernel (the
      // O(block²) dots in primitive loops, not interpreted array
      // folds of a self-join); at corpus scale the block key is an
      // LSH bucket (q43) instead of the label — plan unchanged.
      Tables.table(s, dir, "embeddings")
        .select(col("label").cast("long"), col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Long, Array[Float])]
        .groupByKey(_._1)
        .flatMapGroups { (label, it) =>
          val rows = it.toArray.sortBy(_._2)
          val vds = rows.map(_._3.map(_.toDouble))
          val n2 = vds.map { v =>
            var a = 0.0; var i = 0
            while (i < v.length) { a += v(i) * v(i); i += 1 }; a
          }
          val out = Array.newBuilder[(Long, Long, Long, Double)]
          var i = 0
          while (i < rows.length) {
            var j = i + 1
            while (j < rows.length) {
              val (va, vb) = (vds(i), vds(j))
              var dot = 0.0; var d = 0
              while (d < va.length) { dot += va(d) * vb(d); d += 1 }
              val cos = dot / (math.sqrt(n2(i)) * math.sqrt(n2(j)))
              if (cos >= 0.2) out += ((label, rows(i)._2, rows(j)._2, cos))
              j += 1
            }
            i += 1
          }
          out.result().iterator
        }
        .toDF("label", "id_a", "id_b", "cos")
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_r"))
        .orderBy(col("label"), col("id_a"), col("id_b"))
    },

    // IVF ANN (nprobe=1) over the bounded hash-sampled codebook; the
    // cell assignment is argmax-dot over that codebook, which is plain
    // SQL (cross join + row_number), so the whole query is oracled.
    "q52_ivf_topk" -> { (s, dir) =>
      Similarity.ivfTopK(s, Tables.table(s, dir, "embeddings"), k = 10)
        .orderBy(col("qid"), col("rank"))
    },

    // IVF with nprobe=2 — the recall knob: each query unions exact
    // search over its two best cells (cells are disjoint, so no dedup
    // pass is needed); candidate cost scales with nprobe, the corpus
    // is still scanned once and never shuffled.
    "q69_ivf_nprobe" -> { (s, dir) =>
      Similarity.ivfTopK(s, Tables.table(s, dir, "embeddings"), k = 10, nprobe = 2)
        .orderBy(col("qid"), col("rank"))
    },

    // AVA clip extraction bounds (utils/tools.py:115–138): sort by
    // (entity, ts), group by entity, take [min ts, max ts] as the clip
    // plus the first row's payload (min_by/max_by).
    "q61_entity_clip_bounds" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("value_c", cents(col("value")))
        .groupBy(col("user_id"))
        .agg(min(col("ts_ns")).as("clip_start_ns"),
          max(col("ts_ns")).as("clip_end_ns"),
          min_by(col("event_type"), struct(col("ts_ns"), col("event_id"))).as("first_type"),
          max_by(col("value_c"), struct(col("ts_ns"), col("event_id"))).as("last_value_c"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("clip_start_ns"), col("clip_end_ns"),
          expr("(clip_end_ns - clip_start_ns) DIV 1000000000").as("clip_len_s"),
          col("first_type"), col("last_value_c"), col("n"))
        .orderBy(col("user_id"))
    },

    // The complete Columbia eval (demoTalkNet.py:372–437): per-frame
    // theta join with the evalCol IoU variant (inter / GT area,
    // :140–141) > 0.5, max-IoU face per GT box, binarized score vs GT
    // label, per-speaker F1 + accuracy (:425–437).
    "q60_columbia_eval" -> { (s, dir) =>
      def boxes(of: String, id: String) = Tables.events(s, dir)
        .withColumn("value_c", cents(col("value")))
        .filter(col("event_type") === of)
        .select(col("event_id").as(id), col("user_id").as(s"frame_$id"),
          col("value_c").as(s"vc_$id"),
          (col("value") % 50).as(s"x1_$id"),
          (col("event_id") % 40).cast("double").as(s"y1_$id"))
        .withColumn(s"x2_$id", col(s"x1_$id") + 20.0)
        .withColumn(s"y2_$id", col(s"y1_$id") + 15.0)
      val gt = boxes("view", "g")
        .withColumn("speaker", concat(lit("spk"), col("g") % 5))
        .withColumn("gt_label", (col("g") % 2).cast("long"))
      val pred = boxes("click", "p")
        .withColumn("pred_label", when(col("vc_p") > 25000L, 1L).otherwise(0L))
      val matched = gt.join(pred, col("frame_g") === col("frame_p"))
        .withColumn("ix", greatest(lit(0.0),
          least(col("x2_g"), col("x2_p")) - greatest(col("x1_g"), col("x1_p"))))
        .withColumn("iy", greatest(lit(0.0),
          least(col("y2_g"), col("y2_p")) - greatest(col("y1_g"), col("y1_p"))))
        .withColumn("iou_col", col("ix") * col("iy") / lit(300.0)) // GT area 20×15
        .filter(col("iou_col") > 0.5)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("iou_col").desc, col("p"))))
        .filter(col("rn") === 1)
      matched.groupBy(col("speaker"))
        .agg(
          sum(when(col("pred_label") === 1 && col("gt_label") === 1, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred_label") === 1 && col("gt_label") === 0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("pred_label") === 0 && col("gt_label") === 1, 1L).otherwise(0L)).as("fn"),
          sum(when(col("pred_label") === 0 && col("gt_label") === 0, 1L).otherwise(0L)).as("tn"))
        .withColumn("f1", (lit(2) * col("tp")).cast("double")
          / (lit(2) * col("tp") + col("fp") + col("fn")))
        .withColumn("accuracy", (col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("fn") + col("tn")))
        .orderBy(col("speaker"))
    },

    // The reference's flagship relational query shape
    // (get_ava_active_speaker_performance.py:94–142): gt ⋈ pred on uid
    // with pandas validate="1:1" semantics (Eval.joinOneToOne — the
    // whole validation is ONE count-audit action), then the bbox
    // tolerance audit (:127–140, tol 1e-9). gt/pred boxes derive from
    // events; pred x1 carries planted perturbations — +5e-10 (within
    // tolerance) on every 10th event, +0.5 (audit failure) on every
    // 97th — so both audit branches are exercised.
    "q62_ava_merge_audit" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(
        concat_ws(":", col("user_id"), col("event_id")).as("uid"),
        col("event_id"), col("event_type"), col("value"))
      def withBoxes(df: org.apache.spark.sql.DataFrame, p: String) = df
        .withColumn(s"${p}x1", col("value"))
        .withColumn(s"${p}y1", (col("event_id") % 37).cast("double") + col("value") / 1000.0)
        .withColumn(s"${p}x2", col("value") + 20.0 + (col("event_id") % 7).cast("double"))
        .withColumn(s"${p}y2", col(s"${p}y1") + 15.0)
      // persist both sides: each is consumed twice (the 1:1 count-audit
      // action, then the returned join) — without the cache the events
      // scan + box derivation runs 4× instead of 2×
      val gt = withBoxes(e, "gt_")
        .select(col("uid"), col("event_type"),
          col("gt_x1"), col("gt_y1"), col("gt_x2"), col("gt_y2"))
        .persist()
      val pred = withBoxes(e, "pred_")
        .withColumn("pred_x1", col("pred_x1") +
          (when(col("event_id") % 97 === 0, 0.5).otherwise(0.0) +
           when(col("event_id") % 10 === 0, 5e-10).otherwise(0.0)))
        .select(col("uid"), col("value").as("score"),
          col("pred_x1"), col("pred_y1"), col("pred_x2"), col("pred_y2"))
        .persist()
      Eval.bboxAudit(Eval.joinOneToOne(gt, pred, "uid"), "gt_", "pred_")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("bbox_ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("bbox_ok"), cents(col("score"))).otherwise(0L)).as("score_c_ok"))
        .orderBy(col("event_type"))
    },

    // The reference's COMPLETE run_evaluation file-to-metric shape
    // (get_ava_active_speaker_performance.py:180–205): gt/pred CSVs on
    // disk → schema'd scans + uid derivation (:85) → 1:1-validated
    // merge + bbox audit (:94–140) → ONE VOC average precision over
    // all rows (:143–177). The single global sort is exactly the
    // low-cardinality case the two-phase AP plan exists for, so the
    // AP runs through averagePrecisionScaled with a known-domain
    // bounds hint. Timestamps are exact binary quarters (k·0.25) and
    // boxes exact 1/64ths, so the double→string uid cast and the CSV
    // roundtrip are engine-stable.
    "q71_ava_eval_e2e" -> { (s, dir) =>
      val tmp = scratchDir(s, "graft_ava_eval")
      // the events table arrives as ONE small file at test SFs → a
      // 1-partition scan would serialize both CSV sinks AND every
      // downstream CSV scan; spread the derivation first (at real
      // scale the scan is already wide and this is a cheap rebalance)
      val e = Tables.events(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select(
        concat(lit("v"), col("user_id")).as("video_id"),
        ((col("event_id") % 400).cast("double") * 0.25).as("frame_timestamp"),
        ((col("event_id") % 64).cast("double") / 64.0).as("entity_box_x1"),
        ((col("event_id") % 32).cast("double") / 64.0).as("entity_box_y1"),
        ((col("event_id") % 64).cast("double") / 64.0 + 0.25).as("entity_box_x2"),
        ((col("event_id") % 32).cast("double") / 64.0 + 0.25).as("entity_box_y2"),
        concat(lit("u"), col("user_id"), lit("_e"), col("event_id")).as("entity_id"),
        col("event_id"),
        // UNIQUE exact-integer scores (ties would make the reference
        // evaluator's unstable pandas sort order-dependent — real AVA
        // scores are distinct floats): cents·1e6 + event_id < 2^53
        (cents(col("value")) * 1000000L + col("event_id")).cast("double").as("value"))
      e.select(col("video_id"), col("frame_timestamp"),
          col("entity_box_x1"), col("entity_box_y1"), col("entity_box_x2"), col("entity_box_y2"),
          when(col("event_id") % 3 === 0, "SPEAKING_AUDIBLE").otherwise("NOT_SPEAKING").as("label"),
          col("entity_id"),
          when(col("event_id") % 3 === 0, 1).otherwise(0).as("label_id"),
          col("entity_id").as("instance_id"))
        .write.mode("overwrite").option("header", "true").csv(s"$tmp/gt")
      e.select(col("frame_timestamp"), col("entity_id"), col("event_id"),
          col("entity_box_x1"), col("entity_box_y1"), col("entity_box_x2"), col("entity_box_y2"),
          col("value").as("score"), lit("SPEAKING_AUDIBLE").as("label"))
        .write.mode("overwrite").option("header", "true").csv(s"$tmp/pred")
      // persist the parsed CSVs: each side is scanned by the 1:1
      // count-audit action AND the merge join — uncached, the text
      // parse would run twice per side
      val gt = graft.sources.AvaCsv.readLabels(s, s"$tmp/gt")
        .select(col("uid"), col("label").as("label_gt"),
          col("entity_box_x1").as("gt_x1"), col("entity_box_y1").as("gt_y1"),
          col("entity_box_x2").as("gt_x2"), col("entity_box_y2").as("gt_y2"))
        .persist()
      val pred = s.read.schema("frame_timestamp DOUBLE, entity_id STRING, event_id LONG, " +
          "entity_box_x1 DOUBLE, entity_box_y1 DOUBLE, entity_box_x2 DOUBLE, " +
          "entity_box_y2 DOUBLE, score DOUBLE, label STRING")
        .option("header", "true").csv(s"$tmp/pred")
        .withColumn("uid",
          concat(col("frame_timestamp").cast("string"), lit(":"), col("entity_id")))
        .select(col("uid"), col("event_id"), col("score"),
          col("entity_box_x1").as("pred_x1"), col("entity_box_y1").as("pred_y1"),
          col("entity_box_x2").as("pred_x2"), col("entity_box_y2").as("pred_y2"))
        .persist()
      // persist the merge too: the scaled AP consumes it twice (bucket
      // offsets aggregate + the row-plan window pass)
      // slim to exactly the columns the AP windows carry: boxes/uids
      // would otherwise ride every sort, the persist, and both
      // broadcast joins of the two-phase plan
      val merged = Eval.bboxAudit(Eval.joinOneToOne(gt, pred, "uid"), "gt_", "pred_")
        .select(lit("all").as("grp"), col("score"), col("event_id"), col("bbox_ok"),
          when(col("label_gt") === "SPEAKING_AUDIBLE", 1L).otherwise(0L).as("label"))
        .persist()
      // score = cents(value)·1e6 + event_id, so score-space quantiles
      // are the value quantile grid ×100×1e6 (the +event_id term is
      // < 1e6 — balance noise only). The grp key is a single value, so
      // without real bucket spread every window would serialize into
      // one task.
      val rows = Eval.averagePrecisionScaled(merged, "grp", "score", "label", "event_id",
        buckets = 64,
        boundsHint = Some(eventsValueQ64.map(v => math.round(v * 100).toDouble * 1e6)))
      rows.groupBy(col("grp"))
        .agg((sum(round(col("prec_env") * col("delta_rec") * 1e9).cast("long"))
            .cast("double") / 1.0e9).as("ap"),
          max(col("pos")).as("n_pos"), count(lit(1)).as("n"),
          sum(when(col("bbox_ok"), 1L).otherwise(0L)).as("n_ok"))
        .orderBy(col("grp"))
    },

    // Speaking segments via the custom Catalyst Generator (UDTF form
    // of q32's windows plan): per-track score arrays → segment rows.
    "q59_segments_generator" -> { (s, dir) =>
      import org.apache.spark.sql.GraftBridge
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val series = Tables.events(s, dir)
        .withColumn("frame", (row_number().over(w) - 1).cast("int"))
        .select(col("user_id").as("video_id"), col("frame"), col("value").as("score"))
        .groupBy(col("video_id"))
        .agg(sort_array(collect_list(struct(col("frame"), col("score")))).as("series"))
      series.select(col("video_id"), GraftBridge.column(
          graft.functions.ExplodeSegments(
            GraftBridge.expression(col("series")),
            GraftBridge.expression(lit(30.0)),
            GraftBridge.expression(lit(5)))))
        .select(col("video_id"), col("seg_id"),
          col("start_frame").cast("long").as("start_frame"),
          col("end_frame").cast("long").as("end_frame"), col("n_frames"))
        .orderBy(col("video_id"), col("seg_id"))
    },

    // Two-phase salted aggregation over the (skewed) event_type key —
    // identical results to the plain single-phase agg (the oracle IS
    // the plain agg), balanced shuffles at any skew.
    "q58_salted_agg" -> { (s, dir) =>
      graft.operators.SkewTools.saltedLongStats(
          Tables.events(s, dir).withColumn("value_c", cents(col("value"))),
          keys = Seq("event_type"), longCol = col("value_c"),
          saltSrc = col("event_id"), buckets = 16)
        .select(col("event_type"), col("n"),
          (col("sum").cast("double") / 100.0).as("sum_value"),
          (col("min").cast("double") / 100.0).as("min_value"),
          (col("max").cast("double") / 100.0).as("max_value"))
        .orderBy(col("event_type"))
    },

    // Built-in session_window over event time (the engine-native form
    // of q11's gaps-and-islands; 30-min gap). New session iff
    // gap > 30 min — events exactly 30 min apart MERGE (pinned by
    // RefOpsSpec; the DuckDB oracle uses strict > to match).
    "q53_session_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_c_sum"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("value_c_sum"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Custom DataSource V2 trial-list scan (TalkSet list shape): write
    // TalkSet-format lines, read through TrialListSource with a
    // category filter (pushed to the raw-line prefix) and column
    // pruning (only 3 of 9 fields parsed), aggregate.
    "q55_triallist_v2" -> { (s, dir) =>
      val tmp = scratchDir(s, "graft_tl") + "/lists"
      Tables.table(s, dir, "orders")
        .select(concat(
          format_string("c%d id%05d/clip%d id%05d/clip%d %.2f 0 %.2f 0 0",
            col("o_orderkey") % 5, col("o_custkey"), col("o_orderkey"),
            col("o_custkey"), col("o_orderkey"),
            cents(col("o_totalprice").cast("double")).cast("double") / 100,
            cents(col("o_totalprice").cast("double")).cast("double") / 100),
          when(col("o_orderkey") % 3 === 0,
            format_string(" %06d", col("o_orderkey") % 1000000)).otherwise(lit("")))
          .as("value"))
        .write.mode("overwrite").text(tmp)
      s.read.format(classOf[graft.sources.v2.TrialListSource].getName)
        .option("path", tmp).load()
        .filter(col("category") === "c1")
        .select(col("audio_name"), col("d1"), col("tag"))
        .groupBy(isnull(col("tag")).cast("int").cast("long").as("no_tag"))
        .agg(count(lit(1)).as("n"), sum(cents(col("d1"))).as("d1_c_sum"),
          min(col("audio_name")).as("first_audio"))
        .orderBy(col("no_tag"))
    },

    // HF-style streaming-manifest ingestion (batchProcessVideos.py:
    // 111–124, load_dataset(..., streaming=True, decode=False)):
    // write JSONL sample shards {"video":{"path","bytes"},"label"},
    // scan through ManifestSource (one task per shard, pruned parse),
    // derive video_name = splitext(basename(path)) exactly as the
    // reference does per sample (:122–123), aggregate per label.
    "q63_manifest_ingest" -> { (s, dir) =>
      val tmp = scratchDir(s, "graft_manifest") + "/shards"
      Tables.table(s, dir, "orders")
        .select(to_json(struct(
          struct(
            format_string("data/o%d_c%d.mp4", col("o_orderkey"), col("o_custkey")).as("path"),
            cents(col("o_totalprice").cast("double")).as("bytes")).as("video"),
          format_string("c%d", col("o_orderkey") % 5).as("label"))).as("value"))
        .write.mode("overwrite").text(tmp)
      s.read.format(classOf[graft.sources.v2.ManifestSource].getName)
        .option("path", tmp).load()
        .select(col("label"), col("video_bytes"),
          regexp_extract(col("video_path"), "([^/]+)\\.[^.]+$", 1).as("video_name"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("video_bytes")).as("bytes_sum"),
          min(col("video_name")).as("first_video"))
        .orderBy(col("label"))
    },

    // Frame scan with the -ss/-to range pushdown contract
    // (demoTalkNet.py:486–507): one decode task per video, the frame
    // BETWEEN predicate consumed by the kernel (FrameRangeSpec pins
    // that out-of-range frames are never materialized). Videos come
    // from the supplier dim — a driver-side option build, same as the
    // reference's driver-side video list; the frame DATA never
    // touches the driver.
    "q64_frame_range" -> { (s, dir) =>
      val keys = Tables.table(s, dir, "supplier").select(col("s_suppkey"))
        .collect().map(_.getLong(0)).sorted
      val spec = keys.map(k => s"$k:${5 + k % 7}.0").mkString(";")
      s.read.format(classOf[graft.sources.v2.FrameSource].getName)
        .option("videos", spec).option("fps", "25").load()
        .filter(col("frame") >= 50 && col("frame") <= 149)
        .groupBy(col("video_name"))
        .agg(count(lit(1)).as("n"), min(col("frame")).as("f_lo"),
          max(col("frame")).as("f_hi"), sum(col("checksum")).as("cs_sum"),
          sum(cents(col("t_sec"))).as("t_c_sum"))
        .orderBy(col("video_name"))
    },

    // Prediction-CSV sink + scan roundtrip (talkNet.py:107–115): add
    // score/label columns, drop internal ids, write CSV with header,
    // read back with an explicit schema, aggregate.
    "q54_csv_roundtrip" -> { (s, dir) =>
      val tmp = scratchDir(s, "graft_csv") + "/pred"
      Tables.events(s, dir)
        .withColumn("score", cents(col("value")))
        .withColumn("label", when(col("value") > 50, lit(1)).otherwise(lit(0)))
        .drop("props", "ts_ns", "ts")
        .select(col("user_id"), col("event_type"), col("score"), col("label"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read
        .schema("user_id LONG, event_type STRING, score LONG, label INT")
        .option("header", "true").csv(tmp)
        .groupBy(col("event_type"), col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"), sum(col("score")).as("score_sum"))
        .orderBy(col("event_type"), col("label"))
    },

    // PARTITIONED-layout write + partition-PRUNED read: events land
    // partitioned by event_type (the Hive-style directory layout that
    // lets a 100 TB table answer type-scoped queries by never listing,
    // let alone reading, the other partitions). The read-back filter
    // prunes at PLANNING time — PartitionPruningSpec asserts the scan's
    // PartitionFilters carry the predicate and only matching partition
    // directories are read. Roundtrips through Q.scratchDir like q87.
    "q97_partition_prune" -> { (s, dir) =>
      val out = scratchDir(s, "graft_q97_part") + "/events_p"
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), cents(col("value")).as("value_c"))
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },

    // Bucketed-write sink + CO-LOCATED fact-fact join: both sides are
    // written `bucketBy` the join key (the 100 TB technique for joins
    // run repeatedly — pay the shuffle once at write, never at read;
    // BucketingSpec asserts the read-back plan has NO Exchange on the
    // bucketed keys). The dim side (nation) broadcasts. Roundtrips
    // through Q.scratchDir like q46/q54 — on a real cluster point
    // graft.scratch.dir at shared storage.
    "q87_colocated_join" -> { (s, dir) =>
      val wh = scratchDir(s, "graft_q87_buckets")
      s.sql("DROP TABLE IF EXISTS graft_q87_orders_b")
      s.sql("DROP TABLE IF EXISTS graft_q87_customer_b")
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("graft_q87_orders_b")
      s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("graft_q87_customer_b")
      s.table("graft_q87_orders_b")
        .join(s.table("graft_q87_customer_b"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(s.read.parquet(s"$dir/nation.parquet")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("revenue_c"))
        .orderBy(col("n_name"))
    },
  )

  private val hashSql =
    """CASE WHEN length(text) = 0 THEN 0
      |    ELSE list_reduce(list_transform(range(1, length(text)+1),
      |           i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
      |         (h, b) -> (h * 31 + b) % 1000000007) END""".stripMargin

  /** Mirrors Similarity.ivfTopK(codebookSize=64, queryEvery=50): the
    * codebook is the 64 ids hashing lowest under uhash(5000, ·), cell
    * assignment is argmax-dot over it (ties → smallest centroid id,
    * exactly the kernel's strict-> scan over ascending ids), exact
    * cosine within the cell. Folds strict left-to-right (Q.sqlDotD ≡
    * DotProduct). */
  private val q52Sql =
    s"""WITH cb AS (
       |  SELECT vec_id AS cent_id, embedding AS ce
       |  FROM embeddings
       |  ORDER BY ${Q.uhashSql("5000", "vec_id % 4294967291")}, vec_id
       |  LIMIT 64),
       |asg AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${Q.sqlDotD("c.ce", "e.embedding")} DESC, c.cent_id) AS arn
       |  FROM embeddings e CROSS JOIN cb c),
       |v AS (
       |  SELECT vec_id, embedding, cent_id AS cell,
       |    ${Q.sqlDotD("embedding", "embedding")} AS n2
       |  FROM asg WHERE arn = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2, cell AS qc
       |  FROM v WHERE vec_id % 50 = 0),
       |p AS (SELECT qid, qc, c.vec_id AS cid,
       |    ${Q.sqlDotD("qe", "c.embedding")} / (sqrt(qn2)*sqrt(c.n2)) AS cos
       |  FROM q JOIN v c ON c.cell = qc AND c.vec_id <> qid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM p)
       |SELECT qid, CAST(qc AS BIGINT) AS cell, CAST(rn AS BIGINT) AS rank, cid, round(cos, 6) AS cos_r
       |FROM r WHERE rn <= 10 ORDER BY qid, rank""".stripMargin

  /** q52's structure with the query side probing its arn ≤ 2 cells. */
  private val q69Sql =
    s"""WITH cb AS (
       |  SELECT vec_id AS cent_id, embedding AS ce
       |  FROM embeddings
       |  ORDER BY ${Q.uhashSql("5000", "vec_id % 4294967291")}, vec_id
       |  LIMIT 64),
       |asg AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${Q.sqlDotD("c.ce", "e.embedding")} DESC, c.cent_id) AS arn
       |  FROM embeddings e CROSS JOIN cb c),
       |v AS (
       |  SELECT vec_id, embedding, cent_id AS cell,
       |    ${Q.sqlDotD("embedding", "embedding")} AS n2
       |  FROM asg WHERE arn = 1),
       |probes AS (SELECT vec_id AS qid, cent_id AS qc
       |  FROM asg WHERE vec_id % 50 = 0 AND arn <= 2),
       |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2
       |  FROM v WHERE vec_id % 50 = 0),
       |p AS (SELECT q.qid, c.vec_id AS cid,
       |    ${Q.sqlDotD("qe", "c.embedding")} / (sqrt(qn2)*sqrt(c.n2)) AS cos
       |  FROM q JOIN probes ON probes.qid = q.qid
       |  JOIN v c ON c.cell = probes.qc AND c.vec_id <> q.qid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM p)
       |SELECT qid, CAST(rn AS BIGINT) AS rank, cid, round(cos, 6) AS cos_r
       |FROM r WHERE rn <= 10 ORDER BY qid, rank""".stripMargin

  /** The CSV roundtrip is lossless (shortest-repr doubles), so the
    * oracle recomputes from events: label = event_id%3=0, one global
    * AP over (score desc, event_id), boxes identical → n_ok = n. */
  private val q71Sql =
    """WITH l AS (SELECT event_id,
      |    CAST(CAST(round(value*100) AS BIGINT)*1000000 + event_id AS DOUBLE) AS score,
      |    CAST(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS label
      |  FROM events),
      |s AS (SELECT *,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  CAST(sum(label) OVER (ORDER BY score DESC, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      |  CAST(sum(label) OVER () AS BIGINT) AS pos
      |  FROM l WINDOW w AS (ORDER BY score DESC, event_id)),
      |p AS (SELECT *, CAST(tp AS DOUBLE)/rn AS prec, CAST(tp AS DOUBLE)/pos AS rec FROM s),
      |v AS (SELECT *,
      |  max(prec) OVER (ORDER BY score DESC, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS prec_env,
      |  rec - lag(rec, 1, 0.0) OVER (ORDER BY score DESC, event_id) AS delta_rec
      |  FROM p)
      |SELECT 'all' AS grp,
      |  CAST(sum(CAST(round(prec_env*delta_rec*1e9) AS BIGINT)) AS DOUBLE)/1000000000.0 AS ap,
      |  CAST(max(pos) AS BIGINT) AS n_pos, count(*) AS n, count(*) AS n_ok
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin

  val oracle = Map(
    "q52_ivf_topk" -> q52Sql,
    "q69_ivf_nprobe" -> q69Sql,
    "q71_ava_eval_e2e" -> q71Sql,

    // Mirrors q62 term for term: same box derivations (identical IEEE
    // expression trees on both engines), same planted perturbations,
    // abs-diff <= 1e-9 audit, integer-cents score sum.
    "q62_ava_merge_audit" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS uid,
        |    event_id, event_type, value
        |  FROM events),
        |g0 AS (SELECT uid, event_type, value AS gt_x1,
        |    CAST(event_id % 37 AS DOUBLE) + value/1000.0 AS gt_y1,
        |    value + 20.0 + CAST(event_id % 7 AS DOUBLE) AS gt_x2
        |  FROM e),
        |gt AS (SELECT uid, event_type, gt_x1, gt_y1, gt_x2, gt_y1 + 15.0 AS gt_y2 FROM g0),
        |p0 AS (SELECT uid, value AS score,
        |    value + (CASE WHEN event_id % 97 = 0 THEN 0.5 ELSE 0.0 END
        |           + CASE WHEN event_id % 10 = 0 THEN 5e-10 ELSE 0.0 END) AS pred_x1,
        |    CAST(event_id % 37 AS DOUBLE) + value/1000.0 AS pred_y1,
        |    value + 20.0 + CAST(event_id % 7 AS DOUBLE) AS pred_x2
        |  FROM e),
        |pred AS (SELECT uid, score, pred_x1, pred_y1, pred_x2, pred_y1 + 15.0 AS pred_y2 FROM p0),
        |j AS (SELECT gt.event_type, pred.score,
        |    (abs(gt_x1 - pred_x1) <= 1e-9 AND abs(gt_y1 - pred_y1) <= 1e-9
        |     AND abs(gt_x2 - pred_x2) <= 1e-9 AND abs(gt_y2 - pred_y2) <= 1e-9) AS ok
        |  FROM gt JOIN pred USING (uid))
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        |  CAST(sum(CASE WHEN ok THEN CAST(round(score*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS score_c_ok
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // The manifest roundtrip is lossless (path/bytes/label all derive
    // from orders), so the oracle recomputes straight from orders —
    // same pattern as q46/q54/q55.
    "q63_manifest_ingest" ->
      """SELECT 'c' || CAST(o_orderkey % 5 AS VARCHAR) AS label, count(*) AS n,
        |  CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE)*100) AS BIGINT)) AS BIGINT) AS bytes_sum,
        |  min('o' || CAST(o_orderkey AS VARCHAR) || '_c' || CAST(o_custkey AS VARCHAR)) AS first_video
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors the stub decode arithmetic: frames = 25·durationSec,
    // range(50, min(150, nf)) ≡ the pushed [50,149] clipped per video,
    // checksum = uhash(777, k·1e5+frame), t_sec = frame/25.0. lpad is
    // safe while suppkeys stay ≤ 5 digits (sf0.1 has 1000).
    "q64_frame_range" ->
      s"""WITH v AS (SELECT s_suppkey AS k, 25*(5 + s_suppkey % 7) AS nf FROM supplier),
        |f AS (SELECT k, unnest(range(50, CAST(least(150, nf) AS BIGINT))) AS frame FROM v)
        |SELECT 'v' || lpad(CAST(k AS VARCHAR), 5, '0') AS video_name,
        |  count(*) AS n, min(frame) AS f_lo, max(frame) AS f_hi,
        |  CAST(sum(${Q.uhashSql("777", "k*100000+frame")}) AS BIGINT) AS cs_sum,
        |  CAST(sum(CAST(round(CAST(frame AS DOUBLE)/25*100) AS BIGINT)) AS BIGINT) AS t_c_sum
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_trial_roundtrip" ->
      """SELECT o_orderpriority AS priority, count(*) AS n,
        |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |  CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE)*100) AS BIGINT)) AS BIGINT) AS price_c_sum
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_frame_remap" ->
      """WITH e AS (SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) - 1 AS BIGINT) AS frame2997,
        |    value
        |  FROM events),
        |gt AS (SELECT user_id, CAST(floor(frame2997 / 29.97 * 25) AS BIGINT) AS frame FROM e),
        |pred AS (SELECT user_id, frame2997 AS frame,
        |    CAST(round(value*100) AS BIGINT) AS score_c FROM e)
        |SELECT gt.user_id, count(*) AS n_matched,
        |  CAST(sum(pred.score_c) AS BIGINT) AS score_c_sum
        |FROM gt JOIN pred ON gt.user_id = pred.user_id AND gt.frame = pred.frame
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q48_batch_pack" ->
      """WITH RECURSIVE s AS (
        |  SELECT o_orderpriority AS cat, o_orderkey AS id,
        |    CAST(o_orderkey % 180 + 20 AS BIGINT) AS len,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderkey % 180 + 20 DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |b AS (
        |  SELECT cat AS bcat, CAST(1 AS BIGINT) AS batch_id, CAST(1 AS BIGINT) AS start_rn
        |  FROM (SELECT DISTINCT cat FROM s)
        |  UNION ALL
        |  SELECT bcat, batch_id + 1,
        |    start_rn + greatest(1, 2500 // (SELECT len FROM s WHERE s.cat = bcat AND s.rn = start_rn))
        |  FROM b
        |  WHERE start_rn + greatest(1, 2500 // (SELECT len FROM s WHERE s.cat = bcat AND s.rn = start_rn))
        |        <= (SELECT max(rn) FROM s WHERE s.cat = bcat))
        |SELECT s.cat, b.batch_id, s.id, s.len
        |FROM s JOIN b ON s.cat = b.bcat AND s.rn >= b.start_rn
        |  AND s.rn < b.start_rn + greatest(1, 2500 // (SELECT len FROM s s2 WHERE s2.cat = b.bcat AND s2.rn = b.start_rn))
        |ORDER BY cat, batch_id, len DESC, id DESC""".stripMargin,

    // ASCII-only corpus assumption (see q29/q31): $hashSql folds
    // per-character codepoints; Spark's RollingHash folds UTF-8 octets.
    // They agree only while the documents text is pure ASCII.
    "q49_split_hash" ->
      s"""WITH h AS (SELECT CAST($hashSql AS BIGINT) AS h FROM documents),
         |sp AS (SELECT CASE WHEN h % 10 < 9 THEN 'train' ELSE 'test' END AS split, h FROM h)
         |SELECT split, count(*) AS n, CAST(sum(h) AS BIGINT) AS h_sum
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    "q50_noise_pair_mix" ->
      """WITH p AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
        |    coalesce(lead(vec_id, 1) OVER w, first_value(vec_id) OVER wa) AS partner_id,
        |    coalesce(lead(list_transform(embedding, x -> CAST(x AS DOUBLE)), 1) OVER w,
        |             first_value(list_transform(embedding, x -> CAST(x AS DOUBLE))) OVER wa) AS pv
        |  FROM embeddings
        |  WINDOW w AS (PARTITION BY label ORDER BY vec_id),
        |         wa AS (PARTITION BY label ORDER BY vec_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        |m AS (SELECT vec_id, partner_id,
        |    vd[1:48] AS clean,
        |    list_transform(range(0, 48), i -> pv[1:32][(i % 32) + 1]) AS noise
        |  FROM p WHERE partner_id <> vec_id),
        |d AS (SELECT vec_id, partner_id, clean, noise,
        |    10.0 * log10(list_reduce(list_prepend(0.0, list_transform(clean, x -> x*x)), (a,b) -> a+b) / 48 + 1e-4) AS clean_db,
        |    10.0 * log10(list_reduce(list_prepend(0.0, list_transform(noise, x -> x*x)), (a,b) -> a+b) / 48 + 1e-4) AS noise_db,
        |    CAST(vec_id % 11 - 5 AS DOUBLE) AS snr
        |  FROM m),
        |f AS (SELECT vec_id, partner_id, clean_db, noise_db,
        |    sqrt(pow(10.0, (clean_db - noise_db - snr) / 10)) AS wt,
        |    clean[1] AS c0, noise[1] AS n0
        |  FROM d)
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(partner_id AS BIGINT) AS partner_id,
        |  round(clean_db, 6) AS clean_db, round(noise_db, 6) AS noise_db,
        |  round(wt, 6) AS wt, round(c0 + wt * n0, 6) AS mixed0
        |FROM f ORDER BY vec_id""".stripMargin,

    "q51_format_trunc" ->
      """SELECT o_orderkey,
        |  floor(CAST(o_totalprice AS DOUBLE) / 7 * 100) / 100 AS trunc_cs,
        |  printf('%05d_%06d', o_orderkey % 100000, (o_orderkey * 31) % 1000000) AS fname,
        |  printf('%.2f', floor(CAST(o_totalprice AS DOUBLE) / 7 * 100) / 100) AS price_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q55_triallist_v2" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |    CAST(round(CAST(o_totalprice AS DOUBLE)*100) AS BIGINT) AS c
        |  FROM orders WHERE o_orderkey % 5 = 1),
        |f AS (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 0 ELSE 1 END AS no_tag,
        |    CAST(c AS DOUBLE)/100 AS d1,
        |    printf('id%05d/clip%d', o_custkey, o_orderkey) AS audio_name
        |  FROM t)
        |SELECT CAST(no_tag AS BIGINT) AS no_tag, count(*) AS n,
        |  CAST(sum(CAST(round(d1*100) AS BIGINT)) AS BIGINT) AS d1_c_sum,
        |  min(audio_name) AS first_audio
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q57_embedding_neardup" ->
      """WITH n AS (SELECT label, vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
        |    list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), (a,b) -> a+b) AS n2
        |  FROM embeddings),
        |p AS (SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(a.vd)+1),
        |      i -> a.vd[CAST(i AS INT)] * b.vd[CAST(i AS INT)])), (x,y) -> x+y)
        |      / (sqrt(a.n2)*sqrt(b.n2)) AS cos
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT CAST(label AS BIGINT) AS label, CAST(id_a AS BIGINT) AS id_a,
        |  CAST(id_b AS BIGINT) AS id_b, round(cos, 6) AS cos_r
        |FROM p WHERE cos >= 0.2 ORDER BY label, id_a, id_b""".stripMargin,

    "q56_ap_aggregator" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(round(value*100) AS BIGINT) AS value_c,
        |    CAST(event_id % 2 AS BIGINT) AS label
        |  FROM events),
        |s AS (SELECT *,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(sum(label) OVER (PARTITION BY event_type ORDER BY value_c DESC, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |  CAST(sum(label) OVER (PARTITION BY event_type) AS BIGINT) AS pos
        |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY value_c DESC, event_id)),
        |p AS (SELECT *, CAST(tp AS DOUBLE)/rn AS prec, CAST(tp AS DOUBLE)/pos AS rec FROM s),
        |v AS (SELECT *,
        |  max(prec) OVER (PARTITION BY event_type ORDER BY value_c DESC, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS prec_env,
        |  rec - lag(rec, 1, 0.0) OVER (PARTITION BY event_type ORDER BY value_c DESC, event_id) AS delta_rec
        |  FROM p)
        |SELECT event_type,
        |  CAST(sum(CAST(round(prec_env*delta_rec*1e9) AS BIGINT)) AS DOUBLE)/1000000000.0 AS ap,
        |  CAST(max(pos) AS BIGINT) AS n_pos, count(*) AS n
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q61_entity_clip_bounds" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns,
        |    CAST(round(value*100) AS BIGINT) AS value_c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rrn
        |  FROM events),
        |a AS (SELECT user_id, CAST(min(ts_ns) AS BIGINT) AS clip_start_ns,
        |    CAST(max(ts_ns) AS BIGINT) AS clip_end_ns, count(*) AS n
        |  FROM e GROUP BY user_id)
        |SELECT a.user_id, clip_start_ns, clip_end_ns,
        |  CAST((clip_end_ns - clip_start_ns) // 1000000000 AS BIGINT) AS clip_len_s,
        |  f.event_type AS first_type, l.value_c AS last_value_c, n
        |FROM a
        |JOIN e f ON f.user_id = a.user_id AND f.rn = 1
        |JOIN e l ON l.user_id = a.user_id AND l.rrn = 1
        |ORDER BY a.user_id""".stripMargin,

    "q60_columbia_eval" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, value,
        |    CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |gt AS (SELECT event_id AS g, user_id AS frame, value_c,
        |    value % 50 AS x1, CAST(event_id % 40 AS DOUBLE) AS y1,
        |    'spk' || CAST(event_id % 5 AS VARCHAR) AS speaker,
        |    CAST(event_id % 2 AS BIGINT) AS gt_label
        |  FROM ev WHERE event_type = 'view'),
        |pr AS (SELECT event_id AS p, user_id AS frame, value % 50 AS x1,
        |    CAST(event_id % 40 AS DOUBLE) AS y1,
        |    CASE WHEN value_c > 25000 THEN 1 ELSE 0 END AS pred_label
        |  FROM ev WHERE event_type = 'click'),
        |j AS (SELECT gt.g, gt.speaker, gt.gt_label, pr.p, pr.pred_label,
        |    greatest(0.0, least(gt.x1+20.0, pr.x1+20.0) - greatest(gt.x1, pr.x1)) *
        |    greatest(0.0, least(gt.y1+15.0, pr.y1+15.0) - greatest(gt.y1, pr.y1)) / 300.0 AS iou_col
        |  FROM gt JOIN pr ON gt.frame = pr.frame),
        |m AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY iou_col DESC, p) AS rn
        |  FROM j WHERE iou_col > 0.5),
        |a AS (SELECT speaker,
        |    CAST(sum(CASE WHEN pred_label = 1 AND gt_label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN pred_label = 1 AND gt_label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN pred_label = 0 AND gt_label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN pred_label = 0 AND gt_label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM m WHERE rn = 1 GROUP BY speaker)
        |SELECT speaker, tp, fp, fn, tn,
        |  CAST(2*tp AS DOUBLE) / (2*tp + fp + fn) AS f1,
        |  CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
        |FROM a ORDER BY speaker""".stripMargin,

    "q59_segments_generator" ->
      """WITH e AS (SELECT user_id AS video_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) - 1 AS INT) AS frame,
        |    value AS score
        |  FROM events),
        |f AS (SELECT *, CASE WHEN score > 30.0 THEN 1 ELSE 0 END AS speaking FROM e),
        |c AS (SELECT *,
        |  CASE WHEN lag(speaking) OVER w IS NULL OR lag(speaking) OVER w <> speaking
        |       THEN 1 ELSE 0 END AS changed
        |  FROM f WINDOW w AS (PARTITION BY video_id ORDER BY frame)),
        |g AS (SELECT *,
        |  CAST(sum(changed) OVER (PARTITION BY video_id ORDER BY frame
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
        |  FROM c),
        |runs AS (SELECT video_id, grp,
        |    CAST(min(frame) AS BIGINT) AS start_frame,
        |    CAST(max(frame) + 1 AS BIGINT) AS end_frame,
        |    count(*) AS n_frames
        |  FROM g WHERE speaking = 1 GROUP BY video_id, grp
        |  HAVING max(frame) + 1 - min(frame) >= 5)
        |SELECT video_id,
        |  CAST(row_number() OVER (PARTITION BY video_id ORDER BY start_frame) AS BIGINT) AS seg_id,
        |  start_frame, end_frame, n_frames
        |FROM runs ORDER BY video_id, seg_id""".stripMargin,

    "q58_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
        |  CAST(min(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS min_value,
        |  CAST(max(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q53_session_window" ->
      """WITH e AS (SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
        |              > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |g AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM e)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c_sum
        |FROM g GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin,

    "q54_csv_roundtrip" ->
      """SELECT event_type, CAST(CASE WHEN value > 50 THEN 1 ELSE 0 END AS BIGINT) AS label,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS score_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The partitioned layout is physical; the relational answer is a
    // filtered aggregate.
    "q97_partition_prune" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The bucketed write is a physical-layout choice; the relational
    // answer is the plain join.
    "q87_colocated_join" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
