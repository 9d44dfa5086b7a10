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

  test("bgr2hsv matches OpenCV's uint8 fixed point on primary and edge colors") {
    // pure primaries: (b,g,r) in OpenCV channel order, H in [0,180)
    assert(SceneDetect.bgr2hsv(0, 0, 255) === ((0, 255, 255)))    // red
    assert(SceneDetect.bgr2hsv(0, 255, 0) === ((60, 255, 255)))   // green
    assert(SceneDetect.bgr2hsv(255, 0, 0) === ((120, 255, 255)))  // blue
    assert(SceneDetect.bgr2hsv(0, 255, 255) === ((30, 255, 255))) // yellow
    assert(SceneDetect.bgr2hsv(255, 255, 0) === ((90, 255, 255))) // cyan
    assert(SceneDetect.bgr2hsv(255, 0, 255) === ((150, 255, 255)))// magenta
    // achromatic: diff=0 ⇒ H=0, S=0
    assert(SceneDetect.bgr2hsv(0, 0, 0) === ((0, 0, 0)))
    assert(SceneDetect.bgr2hsv(255, 255, 255) === ((0, 0, 255)))
    assert(SceneDetect.bgr2hsv(128, 128, 128) === ((0, 0, 128)))
    // mixed color (b=64,g=128,r=200): diff=136, S=(136·5222+2048)>>12
    // =173, H=(64·904+2048)>>12=14 — the uint8 fixed-point path
    assert(SceneDetect.bgr2hsv(64, 128, 200) === ((14, 173, 200)))
    // negative-h branch (v==r, g<b): hNum=-100, hdiv[150]=819,
    // (−100·819+2048)>>12 = −20 (arithmetic shift = floor), +180 = 160
    assert(SceneDetect.bgr2hsv(200, 100, 250) === ((160, 153, 250)))
  }

  test("contentVals: identical frames score 0, a hard cut scores the mean HSV delta") {
    // two identical frames then a third that flips every pixel
    // between solid red and solid green (Δ = |0-60| + 0 + 0 over 3)
    val red = Array.tabulate[Byte](12)(i => if (i % 3 == 2) 255.toByte else 0)
    val green = Array.tabulate[Byte](12)(i => if (i % 3 == 1) 255.toByte else 0)
    val rows = Array((0, red), (1, red), (2, green))
    val cv = SceneDetect.contentVals(rows, 2, 2)
    assert(cv.length === 2)
    assert(cv(0) === ((1, 0.0)))
    assert(cv(1)._1 === 2 && cv(1)._2 === 20.0) // (60 + 0 + 0)/3
  }

  test("scenesFromPayloads: content threshold + min-scene-len spacing gate") {
    val red = Array.tabulate[Byte](12)(i => if (i % 3 == 2) 255.toByte else 0)
    val green = Array.tabulate[Byte](12)(i => if (i % 3 == 1) 255.toByte else 0)
    // color flips every frame ⇒ content 20.0 ≥ threshold 15 at every
    // frame — the spacing gate alone decides the cuts (every 4th)
    val rows = (0 until 12).map(f => (f, if (f % 2 == 0) red else green)).toArray
    val scenes = SceneDetect.scenesFromPayloads(rows, 2, 2, threshold = 15.0, minSceneLen = 4)
    assert(scenes === Seq((0, 4), (4, 8), (8, 12)))
    // below threshold ⇒ single scene fallback
    val calm = (0 until 10).map(f => (f, red)).toArray
    assert(SceneDetect.scenesFromPayloads(calm, 2, 2) === Seq((0, 10)))
  }

  test("contentStats emits exact integer channel sums per frame") {
    import spark.implicits._
    val red = Array.tabulate[Byte](12)(i => if (i % 3 == 2) 255.toByte else 0)
    val green = Array.tabulate[Byte](12)(i => if (i % 3 == 1) 255.toByte else 0)
    val df = Seq((1L, 0, red), (1L, 1, red), (1L, 2, green))
      .toDF("video_id", "frame", "payload")
    val stats = SceneDetect.contentStats(spark, df, 2, 2)
      .collect().sortBy(_.frame).map(r => (r.frame, r.dh, r.ds, r.dv))
    // frame 1 vs 0: identical; frame 2 vs 1: ΔH=60 on all 4 pixels
    assert(stats.toSeq === Seq((1, 0L, 0L, 0L), (2, 240L, 0L, 0L)))
  }

  test("distributed contentScenes matches the local kernel per video") {
    import spark.implicits._
    val red = Array.tabulate[Byte](12)(i => if (i % 3 == 2) 255.toByte else 0)
    val green = Array.tabulate[Byte](12)(i => if (i % 3 == 1) 255.toByte else 0)
    val rows = (0 until 12).flatMap { f =>
      Seq((1L, f, if (f % 2 == 0) red else green), (2L, f, red))
    }
    val df = rows.toDF("video_id", "frame", "payload")
    val scenes = SceneDetect.contentScenes(spark, df, 2, 2, threshold = 15.0, minSceneLen = 4)
      .collect().groupBy(_.video_id).view
      .mapValues(_.sortBy(_.scene_id).map(s => (s.start_frame, s.end_frame)).toSeq).toMap
    assert(scenes(1L) === Seq((0, 4), (4, 8), (8, 12)))
    assert(scenes(2L) === Seq((0, 12)))
  }
}
