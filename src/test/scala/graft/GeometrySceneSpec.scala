package graft

import graft.operators.{SceneDetect, TrackGeometry}
import org.apache.spark.sql.functions._

/** Crop geometry + scipy-exact medfilt + scene detection kernels. */
class GeometrySceneSpec extends SparkSpec {

  test("medfiltZeroPad matches scipy zero-padded edges") {
    // scipy.signal.medfilt([1,2,3,4,5], 3) == [1, 2, 3, 4, 4]
    assert(TrackGeometry.medfiltZeroPad(Array(1, 2, 3, 4, 5), 3).toSeq
      === Seq(1.0, 2.0, 3.0, 4.0, 4.0))
    // constant series: zero pad pulls edges down
    // scipy.signal.medfilt([5,5,5,5,5], 5) == [5, 5, 5, 5, 5]? no:
    // windows at i=0: [0,0,5,5,5] -> 5; i=1: [0,5,5,5,5] -> 5 → stays 5
    assert(TrackGeometry.medfiltZeroPad(Array.fill(5)(5.0), 5).toSeq === Seq.fill(5)(5.0))
    // k=5 on [9,9] : i=0 window [0,0,9,9,0]->sorted [0,0,0,9,9] median 0
    assert(TrackGeometry.medfiltZeroPad(Array(9.0, 9.0), 5).toSeq === Seq(0.0, 0.0))
  }

  test("procTracks computes smoothed center/size per track") {
    import spark.implicits._
    val rows = (0 until 20).map(f => (1L, 0L, 0L, f, 10.0, 20.0, 30.0, 60.0))
    val df = rows.toDF("video_id", "scene_id", "track_id", "frame", "x1", "y1", "x2", "y2")
    val proc = TrackGeometry.procTracks(spark, df).collect().sortBy(_.frame)
    assert(proc.length === 20)
    // w=20, h=40 → s=max/2=20, cx=20, cy=40 (constant series, interior)
    assert(proc(10).s === 20.0 && proc(10).cx === 20.0 && proc(10).cy === 40.0)
  }

  test("cropBoxes: bsi/int truncation per the reference") {
    import spark.implicits._
    val proc = Seq((1L, 0L, 0L, 0, 100.0, 50.0, 20.0))
      .toDF("video_id", "scene_id", "track_id", "frame", "cx", "cy", "s")
    val r = TrackGeometry.cropBoxes(proc, 0.40).head()
    // bsi = int(20*1.8) = 36; my=86, mx=136
    assert(r.getAs[Long]("bsi") === 36L)
    assert(r.getAs[Long]("crop_y1") === 66L)   // my - s = 66
    assert(r.getAs[Long]("crop_y2") === 122L)  // my + s*1.8 = 86+36 = 122
    assert(r.getAs[Long]("crop_x1") === 108L)  // mx - s*1.4 = 136-28
    assert(r.getAs[Long]("crop_x2") === 164L)  // mx + s*1.4
  }

  test("scene detection cuts on content jumps; min scene length holds") {
    val contents = (0 until 100).map { f =>
      (f, if (f < 40) 10.0 else if (f < 70) 80.0 else 150.0)
    }.toArray
    val scenes = SceneDetect.detect(contents, threshold = 27.0, minSceneLen = 15)
    assert(scenes === Seq((0, 40), (40, 70), (70, 100)))
  }

  test("no cuts ⇒ whole video is one scene (reference fallback :105–106)") {
    val contents = (0 until 50).map(f => (f, 10.0)).toArray
    assert(SceneDetect.detect(contents) === Seq((0, 50)))
  }

  test("distributed detectAll groups per video") {
    import spark.implicits._
    val df = ((0 until 60).map(f => (1L, f, if (f < 30) 5.0 else 90.0)) ++
      (0 until 40).map(f => (2L, f, 1.0)))
      .toDF("video_id", "frame", "content")
    val scenes = SceneDetect.detectAll(spark, df).collect()
      .groupBy(_.video_id).view.mapValues(_.sortBy(_.scene_id).map(s => (s.start_frame, s.end_frame)).toSeq).toMap
    assert(scenes(1L) === Seq((0, 30), (30, 60)))
    assert(scenes(2L) === Seq((0, 40)))
  }
}
