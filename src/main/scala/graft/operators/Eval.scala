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
    * (reference :105–124). The check is one count-aggregate pass. */
  def joinOneToOne(gt: DataFrame, pred: DataFrame, key: String): DataFrame = {
    val dupG = gt.groupBy(col(key)).count().filter(col("count") > 1).count()
    val dupP = pred.groupBy(col(key)).count().filter(col("count") > 1).count()
    require(dupG == 0, s"joinOneToOne: $dupG duplicate keys on left")
    require(dupP == 0, s"joinOneToOne: $dupP duplicate keys on right")
    val joined = gt.join(pred, Seq(key), "inner")
    val (ng, np, nj) = (gt.count(), pred.count(), joined.count())
    require(ng == nj && np == nj,
      s"joinOneToOne: not 1:1 (left=$ng right=$np joined=$nj)")
    joined
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
