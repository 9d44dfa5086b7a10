package graft

import graft.operators.Eval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the two-phase scale-safe AP plan (Eval.averagePrecisionScaled,
  * windows partitioned by (group, score bucket)) bit-identical to the
  * single-window reference plan on every per-row quantity — rn, tp,
  * pos, prec, rec, prec_env, delta_rec — not just the final AP. The
  * doubles must match EXACTLY (==, no epsilon): the scaled plan
  * reassembles the same integer rank/cumsum before any division, so
  * the IEEE operations are literally the same.
  */
class ApScaledSpec extends SparkSpec {

  /** The reference single-window row plan (the shape of
    * get_ava_active_speaker_performance.py:57–67, one sort per group). */
  private def plainRows(df: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("uid"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val wSufAsPrefix = Window.partitionBy(col("grp"))
      .orderBy(col("score").asc, col("uid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("tp", sum(col("label")).over(wCum))
      .withColumn("pos", sum(col("label")).over(wAll))
      .withColumn("prec", col("tp").cast("double") / col("rn"))
      .withColumn("rec", col("tp").cast("double") / col("pos"))
      .withColumn("prec_env", max(col("prec")).over(wSufAsPrefix))
      .withColumn("delta_rec", col("rec") - lag(col("rec"), 1, 0.0).over(wOrd))
  }

  private val cols = Seq("rn", "tp", "pos", "prec", "rec", "prec_env", "delta_rec")

  private def assertRowParity(df: DataFrame, buckets: Int): Unit = {
    def keyed(r: DataFrame) = r
      .select((Seq(col("grp"), col("uid")) ++ cols.map(col)): _*)
      .collect().map(row => (row.getString(0), row.getLong(1)) -> row.toSeq.drop(2)).toMap
    val plain = keyed(plainRows(df))
    val scaled = keyed(Eval.averagePrecisionScaled(df, "grp", "score", "label", "uid", buckets))
    assert(scaled.keySet === plain.keySet)
    for ((k, p) <- plain) {
      val s = scaled(k)
      cols.indices.foreach { i =>
        assert(s(i) === p(i), s"row $k col ${cols(i)}: scaled=${s(i)} plain=${p(i)}")
      }
    }
  }

  /** Deterministic pseudo-random fixture: few groups, duplicated
    * scores (ties must collide into one bucket), mixed labels. */
  private def fixture(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val grp = "g" + (i % 3)
      // ~n/4 distinct scores → plenty of cross-row ties
      val score = ((i * 2654435761L) % (n / 4)).toDouble / 7.0
      val label = if ((i * 40503L) % 5 < 2) 1L else 0L
      (grp, score, label, i.toLong)
    }.toDF("grp", "score", "label", "uid")
  }

  test("scaled plan row-identical to single-window plan (ties, 3 groups, 32 buckets)") {
    assertRowParity(fixture(2000), buckets = 32)
  }

  test("scaled plan row-identical when buckets exceed distinct scores") {
    assertRowParity(fixture(120), buckets = 64)
  }

  test("explicit bounds hint (quantile job skipped) is still row-identical") {
    val df = fixture(1500)
    def keyed(r: DataFrame) = r
      .select((Seq(col("grp"), col("uid")) ++ cols.map(col)): _*)
      .collect().map(row => (row.getString(0), row.getLong(1)) -> row.toSeq.drop(2)).toMap
    val plain = keyed(plainRows(df))
    // deliberately lousy bounds (uneven, partly out of range): balance
    // suffers, values must not
    val hint = Array(-5.0, 1.0, 2.5, 7.0, 10.0, 1e9)
    val hinted = keyed(Eval.averagePrecisionScaled(
      df, "grp", "score", "label", "uid", buckets = 8, boundsHint = Some(hint)))
    assert(hinted === plain)
  }

  test("degenerate all-equal scores collapse to one bucket and still match") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g", 1.0, (i % 2).toLong, i.toLong))
      .toDF("grp", "score", "label", "uid")
    assertRowParity(df, buckets = 16)
  }

  test("aggregated AP identical between averagePrecision and the scaled row plan") {
    // Per-row doubles are bit-identical (proved above), but a double
    // SUM depends on partition order — so aggregate the q15 way:
    // round each contribution to integer nano-units first (longs sum
    // order-insensitively), on BOTH plans.
    val df = fixture(3000)
    def apOf(rows: DataFrame) = rows
      .withColumn("contrib_n", round(col("prec_env") * col("delta_rec") * 1e9).cast("long"))
      .groupBy(col("grp")).agg(sum(col("contrib_n")).as("ap_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(apOf(Eval.averagePrecisionScaled(df, "grp", "score", "label", "uid", 32))
      === apOf(plainRows(df)))
  }

  test("scaled plan's heavy windows partition by (group, bucket), not group alone") {
    val plan = Eval.averagePrecisionScaled(fixture(500), "grp", "score", "label", "uid", 32)
      .queryExecution.optimizedPlan.toString
    // every row-scale Window node must carry _apb in its partition spec
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val rowScale = windowSpecs.filter(l => l.contains("score"))
    assert(rowScale.nonEmpty)
    rowScale.foreach(l => assert(l.contains("_apb"), s"row-scale window missing bucket key: $l"))
  }
}
