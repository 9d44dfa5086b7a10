package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Speaking-segment extraction with the reference's exact semantics
  * (extractSpeakingSegments.py:44–61 `find_speaking_segments` +
  * the `>= min_frames` duration gate at :98–99):
  *
  *  - `speaking = score > threshold` (strict >);
  *  - contiguous runs over the dense frame index, END-EXCLUSIVE
  *    (a run closes at the first non-speaking frame i → (start, i));
  *  - a trailing open run closes at n (len of the score array);
  *  - duration gate: (end - start) >= floor(minDurationS * fps);
  *  - seconds are frame/fps doubles (frame↔time at hard-coded fps,
  *    extractSpeakingSegments.py:65–66).
  *
  * Pure gaps-and-islands windows — partitioned by track key, so it
  * scales with track count; no state beyond one window frame.
  */
object SpeakingSegments {

  /** scores: one row per (keyCols..., frame, score), frames dense per key. */
  def extract(scores: DataFrame, threshold: Double, minDurationS: Double,
      fps: Int = 25, keyCols: Seq[String] = Seq("video_id", "track_id")): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("frame"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val minFrames = (minDurationS * fps).toInt // int() truncation, as the reference
    val lagSp = lag(col("speaking"), 1).over(w)
    scores
      .withColumn("speaking", when(col("score") > threshold, 1L).otherwise(0L))
      .withColumn("changed", when(lagSp.isNull || lagSp =!= col("speaking"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("changed")).over(wCum))
      .filter(col("speaking") === 1L)
      .groupBy((keys :+ col("grp")): _*)
      .agg(min(col("frame")).as("start_frame"),
           (max(col("frame")) + 1L).as("end_frame"), // end-exclusive
           count(lit(1)).as("n_frames"))
      .filter(col("end_frame") - col("start_frame") >= minFrames)
      .withColumn("seg_id",
        row_number().over(Window.partitionBy(keys: _*).orderBy(col("start_frame"))).cast("long"))
      .select(keys ++ Seq(col("seg_id"), col("start_frame"), col("end_frame"), col("n_frames"),
        (col("start_frame").cast("double") / fps).as("start_s"),
        (col("end_frame").cast("double") / fps).as("end_s"),
        ((col("end_frame") - col("start_frame")).cast("double") / fps).as("duration_s")): _*)
  }
}
