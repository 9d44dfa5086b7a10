package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Track → crop geometry (demoTalkNet.py:185–205): per-frame crop
  * center/size with the scipy-exact median filter smoothing
  * (`signal.medfilt`, kernel 13, ZERO-padded edges — unlike a
  * shrinking window, scipy pads out-of-range samples with 0, which
  * pulls edge medians down; reproduced bit-for-bit here), then the
  * padded square crop box (`bsi = int(bs·(1+2·cs))`).
  *
  * Geometry is plain column math; the median filter is a per-track
  * kernel (groupByKey.flatMapGroups) because the zero-padded window
  * is a sequential array op, not a relational frame.
  */
object TrackGeometry {

  final case class ProcFrame(
      video_id: Long, scene_id: Long, track_id: Long, frame: Int,
      cx: Double, cy: Double, s: Double)

  /** scipy.signal.medfilt with zero padding, odd k. */
  def medfiltZeroPad(xs: Array[Double], k: Int): Array[Double] = {
    require(k % 2 == 1, "medfilt kernel must be odd")
    val half = k / 2
    val out = new Array[Double](xs.length)
    val win = new Array[Double](k)
    var i = 0
    while (i < xs.length) {
      var j = 0
      while (j < k) {
        val idx = i - half + j
        win(j) = if (idx < 0 || idx >= xs.length) 0.0 else xs(idx)
        j += 1
      }
      java.util.Arrays.sort(win)
      out(i) = win(half)
      i += 1
    }
    out
  }

  /** Track frames (video_id, scene_id, track_id, frame, x1..y2) →
    * smoothed crop center/size series (the reference's proc_track:
    * s = max(h,w)/2, cy = (y1+y3)/2, cx = (x1+x2)/2, each medfilt-13).
    */
  def procTracks(spark: SparkSession, trackFrames: DataFrame, k: Int = 13): Dataset[ProcFrame] = {
    import spark.implicits._
    trackFrames
      .select(col("video_id").cast("long"), col("scene_id").cast("long"),
        col("track_id").cast("long"), col("frame").cast("int"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"))
      .as[(Long, Long, Long, Int, Double, Double, Double, Double)]
      .groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroups { (key: (Long, Long, Long), it: Iterator[(Long, Long, Long, Int, Double, Double, Double, Double)]) =>
        val rows = it.toArray.sortBy(_._4)
        val s = medfiltZeroPad(rows.map(r => math.max(r._8 - r._6, r._7 - r._5) / 2), k)
        val cy = medfiltZeroPad(rows.map(r => (r._6 + r._8) / 2), k)
        val cx = medfiltZeroPad(rows.map(r => (r._5 + r._7) / 2), k)
        rows.indices.iterator.map { i =>
          ProcFrame(key._1, key._2, key._3, rows(i)._4, cx(i), cy(i), s(i))
        }
      }
  }

  /** Padded crop box per frame (demoTalkNet.py:196–205): after padding
    * the image by bsi = int(bs·(1+2·cs)) the crop is
    * y ∈ [my−bs, my+bs·(1+2cs)), x ∈ [mx−bs·(1+cs), mx+bs·(1+cs))
    * with my = cy+bsi, mx = cx+bsi (int truncation as the reference). */
  def cropBoxes(proc: DataFrame, cropScale: Double = 0.40): DataFrame = {
    val bsi = floor(col("s") * (1 + 2 * cropScale)).cast("long")
    proc
      .withColumn("bsi", bsi)
      .withColumn("my", col("cy") + col("bsi"))
      .withColumn("mx", col("cx") + col("bsi"))
      .withColumn("crop_y1", (col("my") - col("s")).cast("long"))
      .withColumn("crop_y2", (col("my") + col("s") * (1 + 2 * cropScale)).cast("long"))
      .withColumn("crop_x1", (col("mx") - col("s") * (1 + cropScale)).cast("long"))
      .withColumn("crop_x2", (col("mx") + col("s") * (1 + cropScale)).cast("long"))
  }
}
