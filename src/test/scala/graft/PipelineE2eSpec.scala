package graft

import graft.pipeline.BatchPipeline
import graft.sinks.MediaSinks
import graft.sources.v2.FrameSource
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The full story wired together: the V2 frame scan (with its decode
  * kernel) feeds the pipeline DAG, and the pipeline's speaking
  * segments flow into the distributed segment file sink — source →
  * process → sink, all on the executors. */
class PipelineE2eSpec extends SparkSpec {

  test("FrameSource frames drive the pipeline; its segments land in the file sink") {
    // two 8 s videos at 25 fps = 200 frames; content steps +80 every
    // 100 frames (a scene cut, > the 27.0 threshold) with sub-
    // threshold checksum jitter riding on top
    val frames = spark.read.format(classOf[FrameSource].getName)
      .option("videos", "1:8.0;2:8.0").option("fps", "25").load()
      .select(substring(col("video_name"), 2, 5).cast("long").as("video_id"),
        col("frame").cast("int"),
        (floor(col("frame") / 100) * 80.0 + 10.0 +
          (col("checksum") % 2).cast("double") * 0.1).as("content"))
    val r = BatchPipeline.run(spark, frames)
    val nSeg = r.segments.count()
    assert(nSeg > 0)
    assert(r.scenes.count() === 4) // 2 scenes per video

    val out = Files.createTempDirectory("graft_e2e").toString
    val manifest = MediaSinks.cutSegments(spark, r.segments, out).collect()
    assert(manifest.length === 2 * nSeg) // avi + wav per segment
    manifest.foreach { m =>
      assert(Files.size(Paths.get(m.getString(3))) === m.getLong(4), m.getString(3))
    }
  }

  test("runFromPayloads: the real ContentDetector chain drives scenes and content") {
    import spark.implicits._
    // video 9: color flips red↔green at frame 100 of 200 (one hard
    // cut, ΔH=60 ⇒ content 20 < 27 — below the DEFAULT threshold, so
    // use 15); video 10: constant color ⇒ one scene
    val red = Array.tabulate[Byte](768)(i => if (i % 3 == 2) 255.toByte else 0)
    val green = Array.tabulate[Byte](768)(i => if (i % 3 == 1) 255.toByte else 0)
    val payloads = ((0 until 200).map(f => (9L, f, if (f < 100) red else green)) ++
        (0 until 200).map(f => (10L, f, red)))
      .toDF("video_id", "frame", "payload")
    val r = BatchPipeline.runFromPayloads(spark, payloads,
      sceneThreshold = 15.0, minSceneLen = 15)
    val scenes = r.scenes.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getInt(3))).sorted
    assert(scenes.toSeq === Seq((9L, 0L, 0, 100), (9L, 1L, 100, 200), (10L, 0L, 0, 200)))
    // the frames content column carries the real per-frame deltas:
    // exactly one nonzero-content frame (the cut at frame 100)
    assert(r.segments.count() > 0 && r.summary.count() === 2)
  }

  test("visualization and image sinks consume real pipeline outputs") {
    val frames = spark.read.format(classOf[FrameSource].getName)
      .option("videos", "5:8.0").option("fps", "25").load()
      .select(substring(col("video_name"), 2, 5).cast("long").as("video_id"),
        col("frame").cast("int"),
        (floor(col("frame") / 100) * 80.0 + 10.0).as("content"))
    val r = BatchPipeline.run(spark, frames)
    // overlay rows: smoothed scores joined with the medfilt geometry
    val smoothed = BatchPipeline.smoothScoresQuirk(spark, r.scores)
      .select(col("video_id"), col("track_id"), col("frame"), col("smoothed").as("score"))
    val overlays = smoothed.join(r.procTracks.toDF()
        .select(col("video_id"), col("track_id"), col("frame"),
          col("cx").as("x"), col("cy").as("y"), col("s")),
      Seq("video_id", "track_id", "frame"))
    val out = Files.createTempDirectory("graft_e2e_vis").toString
    val vis = MediaSinks.writeVisualization(spark, overlays, out).collect()
    assert(vis.length === 1)
    assert(Files.exists(Paths.get(out, "v00005", "pyavi", "video_out.avi")))

    // face-crop image sink from track geometry (tools.py layout)
    val crops = r.procTracks.toDF().select(
      concat(lit("v"), col("video_id")).as("video_key"),
      concat(lit("v"), col("video_id"), lit("_t"), col("track_id")).as("entity_id"),
      (col("frame").cast("double") / 25).as("frame_timestamp"),
      (col("cx") - col("s")).as("x1"), (col("cy") - col("s")).as("y1"),
      (col("cx") + col("s")).as("x2"), (col("cy") + col("s")).as("y2"))
    val cropped = MediaSinks.writeFaceCrops(spark, crops, out + "/crops").collect()
    assert(cropped.length === r.procTracks.toDF().count())
    // frame dump from the decoded frame table
    val dumped = MediaSinks.dumpFrames(spark, frames.select("video_id", "frame"),
      out + "/frames").collect()
    assert(dumped.length === 200)
  }
}
