package graft

import graft.operators.SpeakingSegments
import org.apache.spark.sql.functions._

/** Pins extractSpeakingSegments.py:44–61 semantics: strict >, runs are
  * end-exclusive, trailing open run closes at n, duration gate is >=. */
class SegmentsSpec extends SparkSpec {

  private def seg(scores: Seq[Double], thr: Double = 0.0, minDur: Double = 0.2) = {
    import spark.implicits._
    val df = scores.zipWithIndex
      .map { case (s, i) => (1L, 0L, i, s) }
      .toDF("video_id", "track_id", "frame", "score")
    SpeakingSegments.extract(df, thr, minDur)
      .orderBy(col("seg_id"))
      .select("start_frame", "end_frame", "n_frames")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
  }

  test("contiguous runs, end-exclusive bounds") {
    // scores: - + + + + + - + + + + +  (thr 0, minDur 0.2s → 5 frames)
    val got = seg(Seq(-1, 1, 1, 1, 1, 1, -1, 1, 1, 1, 1, 1))
    assert(got.toSeq === Seq((1, 6L, 5L), (7, 12L, 5L)))
  }

  test("trailing open run closes at n (reference :57–59)") {
    val got = seg(Seq(-1, -1, 1, 1, 1, 1, 1)) // speaking to the end
    assert(got.toSeq === Seq((2, 7L, 5L)))
  }

  test("minDuration gate is >= (reference :98–99)") {
    // exactly 5 frames with minDur 0.2*25=5 → kept; 4 frames → dropped
    assert(seg(Seq(1, 1, 1, 1, 1)).length === 1)
    assert(seg(Seq(1, 1, 1, 1, -1)).length === 0)
  }

  test("threshold is strict > (score == thr is not speaking)") {
    assert(seg(Seq(0, 0, 0, 0, 0, 0), thr = 0.0).length === 0)
    assert(seg(Seq(1e-9, 1e-9, 1e-9, 1e-9, 1e-9), thr = 0.0).length === 1)
  }

  test("seconds derive as frame/fps (reference :65–66)") {
    import spark.implicits._
    val df = (0 until 10).map(i => (1L, 0L, i, 1.0)).toDF("video_id", "track_id", "frame", "score")
    val r = SpeakingSegments.extract(df, 0.0, 0.2).select("start_s", "end_s", "duration_s").head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === 0.4 && r.getDouble(2) === 0.4)
  }
}
