package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The AVA evaluation pipeline as reusable plans — the reference's one
  * genuinely relational query (utils/get_ava_active_speaker_performance.py):
  * 1:1-validated uid join + bbox tolerance audit (:94–142), then
  * VOC-style average precision (:23–67).
  *
  * Scale notes: the join is a plain equi-join (Catalyst picks
  * broadcast vs sort-merge); AP is computed per group so its windows
  * partition — the reference's single global sort becomes a global
  * sort only when run with one group, which is exactly its semantics.
  */
object Eval {

  /** Inner equi-join with pandas `validate="1:1"` semantics: raises if
    * either side has duplicate keys or the sides don't match exactly
    * (reference :105–124).
    *
    * The whole validation is ONE driver action: a full-outer join of
    * the two per-key count aggregates, reduced to four violation
    * counters (dup-left, dup-right, key-only-left, key-only-right).
    * 1:1 ⟺ all four are zero, which also pins joined-count == both
    * side counts, so no separate count() actions are needed. At 100 TB
    * this is two scans total (validation + the returned join) instead
    * of the naive five full recomputations. */
  def joinOneToOne(gt: DataFrame, pred: DataFrame, key: String): DataFrame = {
    val gc = gt.groupBy(col(key)).agg(count(lit(1)).as("_ng"))
    val pc = pred.groupBy(col(key)).agg(count(lit(1)).as("_np"))
    val v = gc.join(pc, Seq(key), "full_outer")
      .agg(sum(when(col("_ng") > 1, 1L).otherwise(0L)).as("dup_l"),
           sum(when(col("_np") > 1, 1L).otherwise(0L)).as("dup_r"),
           sum(when(col("_np").isNull, 1L).otherwise(0L)).as("only_l"),
           sum(when(col("_ng").isNull, 1L).otherwise(0L)).as("only_r"))
      .first()
    require(v.getLong(0) == 0 && v.getLong(1) == 0,
      s"joinOneToOne: duplicate keys (left=${v.getLong(0)} right=${v.getLong(1)})")
    require(v.getLong(2) == 0 && v.getLong(3) == 0,
      s"joinOneToOne: unmatched keys (left-only=${v.getLong(2)} right-only=${v.getLong(3)})")
    gt.join(pred, Seq(key), "inner")
  }

  /** Bbox-equality audit within tolerance (reference :127–140):
    * adds bool `bbox_ok` = all four |Δ| <= tol. */
  def bboxAudit(df: DataFrame, leftPrefix: String, rightPrefix: String,
      tol: Double = 1e-9): DataFrame = {
    val ok = Seq("x1", "y1", "x2", "y2")
      .map(c => abs(col(s"$leftPrefix$c") - col(s"$rightPrefix$c")) <= tol)
      .reduce(_ && _)
    df.withColumn("bbox_ok", ok)
  }

  /** Per-group VOC average precision with monotone precision envelope
    * (reference :57–67; Σ Δrecall·envelope over desc-score order).
    * `df` needs groupCol, scoreCol (numeric), labelCol (0/1), and a
    * unique tie-break column `tieCol`. */
  def averagePrecision(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String, tieCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(tieCol))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    // suffix max via reversed-order prefix frame (O(n), not O(n²))
    val wSufAsPrefix = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(tieCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("tp", sum(col(labelCol)).over(wCum))
      .withColumn("pos", sum(col(labelCol)).over(wAll))
      .withColumn("prec", col("tp").cast("double") / col("rn"))
      .withColumn("rec", col("tp").cast("double") / col("pos"))
      .withColumn("prec_env", max(col("prec")).over(wSufAsPrefix))
      .withColumn("delta_rec", col("rec") - lag(col("rec"), 1, 0.0).over(wOrd))
      .groupBy(col(groupCol))
      .agg(sum(col("prec_env") * col("delta_rec")).as("ap"),
           max(col("pos")).as("n_pos"), count(lit(1)).as("n"))
  }

  /** Scale-safe two-phase AP row plan: produces EXACTLY the numbers of
    * the single-window plan (rn/tp/pos/prec/rec/prec_env/delta_rec per
    * row), but every row-scale window partitions by (group,
    * score-range bucket) instead of group alone — parallelism
    * G×buckets, so a low-cardinality group key (AVA has 5 event
    * classes) no longer serializes the sort at 100× scale.
    *
    * How the global quantities recover from bucket-local ones:
    *  - buckets are score ranges (same score ⇒ same bucket; bucket
    *    asc ≡ score desc), so global rank = Σ earlier-bucket counts +
    *    local rank, global tp-cumsum = Σ earlier-bucket positives +
    *    local cumsum — both integer, hence prec/rec bit-identical;
    *  - the suffix-max precision envelope = max(local suffix max,
    *    max precision of any LATER bucket) — max is associative, so
    *    regrouping cannot change the value;
    *  - lag(rec) at a bucket's first row = tp_offset/pos, the exact
    *    double the previous bucket's last row carries.
    * The per-bucket offset/tail tables are G×buckets rows — they ride
    * tiny windows and broadcast back. The one caveat: a corpus where
    * nearly all scores are ONE value degenerates to one bucket (range
    * buckets cannot split ties); that corpus defeats any order-exact
    * AP parallelization.
    *
    * Cost shape: one shuffle of the big input (by group+bucket, reused
    * by both local windows and the bucket-stat aggregates), one
    * persist so the envelope's second pass doesn't recompute, two
    * broadcast joins. Bucket boundaries only steer BALANCE, never the
    * result — so when the score domain is known (`boundsHint`), the
    * `approxQuantile` job is skipped entirely; otherwise one cheap
    * driver action estimates them. */
  def averagePrecisionScaled(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String, tieCol: String, buckets: Int = 64,
      boundsHint: Option[Array[Double]] = None): DataFrame = {
    val g = col(groupCol)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = boundsHint
      .getOrElse(df.stat.approxQuantile(scoreCol, probs, 1.0 / (4.0 * buckets)))
      .distinct.sorted
    // bucket k = #{quantile bounds >= score}: monotone nonincreasing
    // in score, equal scores collide — a codegen'd chain of compares
    val bucketExpr = if (bounds.isEmpty) lit(0L)
      else bounds.toSeq.map(b => when(col(scoreCol) <= lit(b), 1L).otherwise(0L)).reduce(_ + _)
    val bk = df.withColumn("_apb", bucketExpr)

    // per-(group, bucket) counts → rank/tp offsets; G×buckets rows
    val wPrev = Window.partitionBy(g).orderBy(col("_apb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bk.groupBy(g, col("_apb"))
      .agg(count(lit(1)).as("_bn"), sum(col(labelCol)).as("_bp"))
      .withColumn("_rn_off", coalesce(sum(col("_bn")).over(wPrev), lit(0L)))
      .withColumn("_tp_off", coalesce(sum(col("_bp")).over(wPrev), lit(0L)))
      .withColumn("_pos", sum(col("_bp")).over(Window.partitionBy(g)))
      .select(g, col("_apb"), col("_rn_off"), col("_tp_off"), col("_pos"))

    val wLoc = Window.partitionBy(g, col("_apb")).orderBy(col(scoreCol).desc, col(tieCol))
    val wLocCum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // suffix max via reversed-order prefix frame (O(n), see q15 note)
    val wLocRev = Window.partitionBy(g, col("_apb"))
      .orderBy(col(scoreCol).asc, col(tieCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rows = bk.join(broadcast(offs), Seq(groupCol, "_apb"))
      .withColumn("rn", col("_rn_off") + row_number().over(wLoc))
      .withColumn("tp", col("_tp_off") + sum(col(labelCol)).over(wLocCum))
      .withColumn("pos", col("_pos"))
      .withColumn("prec", col("tp").cast("double") / col("rn"))
      .withColumn("rec", col("tp").cast("double") / col("pos"))
      .persist()

    // per-bucket max precision → strict later-bucket (suffix) max;
    // G×buckets rows again
    val wTail = Window.partitionBy(g).orderBy(col("_apb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tails = rows.groupBy(g, col("_apb")).agg(max(col("prec")).as("_bmax"))
      .withColumn("_tail", max(col("_bmax")).over(wTail))
      .select(g, col("_apb"), col("_tail"))

    rows.join(broadcast(tails), Seq(groupCol, "_apb"))
      // greatest() skips the null _tail of the last bucket
      .withColumn("prec_env", greatest(max(col("prec")).over(wLocRev), col("_tail")))
      .withColumn("delta_rec", col("rec") -
        coalesce(lag(col("rec"), 1).over(wLoc), col("_tp_off").cast("double") / col("_pos")))
  }

  /** Per-group F1 / accuracy from binarized predictions
    * (Columbia eval, demoTalkNet.py:425–437). */
  def f1PerGroup(df: DataFrame, groupCol: String, predCol: String,
      labelCol: String): DataFrame = {
    df.groupBy(col(groupCol))
      .agg(sum(when(col(predCol) === 1 && col(labelCol) === 1, 1L).otherwise(0L)).as("tp"),
           sum(when(col(predCol) === 1 && col(labelCol) === 0, 1L).otherwise(0L)).as("fp"),
           sum(when(col(predCol) === 0 && col(labelCol) === 1, 1L).otherwise(0L)).as("fn"),
           sum(when(col(predCol) === 0 && col(labelCol) === 0, 1L).otherwise(0L)).as("tn"))
      .withColumn("f1", (lit(2) * col("tp")).cast("double") / (lit(2) * col("tp") + col("fp") + col("fn")))
      .withColumn("accuracy", (col("tp") + col("tn")).cast("double") / (col("tp") + col("fp") + col("fn") + col("tn")))
  }
}
