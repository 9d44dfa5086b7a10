package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Scene detection analog (demoTalkNet.py:93–110): the reference runs
  * PySceneDetect's ContentDetector — a sequential scan over per-frame
  * content values that cuts where the frame-to-frame delta exceeds a
  * threshold, with a minimum scene length, and falls back to "whole
  * video is one scene" when no cut fires (:105–106).
  *
  * The frame-content extraction itself is a media kernel (stubbed in
  * this container); this operator is the order-dependent scan, shaped
  * as a per-video flatMapGroups kernel — scenes then become the
  * parallelism unit for tracking (SURVEY §4 "fat partitions").
  */
object SceneDetect {

  final case class Scene(video_id: Long, scene_id: Long, start_frame: Int, end_frame: Int)

  /** Sequential cut detection over one video's (frame, content) series. */
  def detect(contents: Array[(Int, Double)], threshold: Double = 27.0,
      minSceneLen: Int = 15): Seq[(Int, Int)] = {
    val sorted = contents.sortBy(_._1)
    if (sorted.isEmpty) return Seq.empty
    val first = sorted.head._1
    val end = sorted.last._1 + 1
    val cuts = Seq.newBuilder[Int]
    var lastCut = first
    var i = 1
    while (i < sorted.length) {
      val delta = math.abs(sorted(i)._2 - sorted(i - 1)._2)
      if (delta > threshold && sorted(i)._1 - lastCut >= minSceneLen) {
        cuts += sorted(i)._1
        lastCut = sorted(i)._1
      }
      i += 1
    }
    val cutList = cuts.result()
    val bounds = (first +: cutList) :+ end
    val scenes = bounds.sliding(2).map(b => (b(0), b(1))).toSeq
    // reference fallback: empty cut list ⇒ whole video is one scene
    if (scenes.isEmpty) Seq((first, end)) else scenes
  }

  /** frameContents(video_id, frame, content) → scene table. */
  def detectAll(spark: SparkSession, frameContents: DataFrame,
      threshold: Double = 27.0, minSceneLen: Int = 15): Dataset[Scene] = {
    import spark.implicits._
    frameContents
      .select(col("video_id").cast("long"), col("frame").cast("int"),
        col("content").cast("double"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (vid: Long, it: Iterator[(Long, Int, Double)]) =>
        val arr = it.map(r => (r._2, r._3)).toArray
        detect(arr, threshold, minSceneLen).zipWithIndex.iterator.map {
          case ((s, e), i) => Scene(vid, i.toLong, s, e)
        }
      }
  }
}
