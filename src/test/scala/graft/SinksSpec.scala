package graft

import graft.sinks.MediaSinks
import graft.sources.Wav
import java.nio.file.{Files, Paths}

/** The media file sinks: reference naming/layout contracts, the real
  * WAV cut arithmetic, and manifest fidelity. */
class SinksSpec extends SparkSpec {

  test("segment sink writes track_%05d_segment_%03d.{avi,wav} with a real WAV cut") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_segsink").toString
    val segments = Seq((7L, 3L, 1L, 10L, 20L), (7L, 3L, 2L, 40L, 45L))
      .toDF("video_id", "track_id", "seg_id", "start_frame", "end_frame")
    val manifest = MediaSinks.cutSegments(spark, segments, out).collect()
    assert(manifest.length === 4) // avi + wav per segment
    val wav1 = Paths.get(out, "v00007", "track_00003_segment_001.wav")
    assert(Files.exists(wav1))
    assert(Files.exists(Paths.get(out, "v00007", "track_00003_segment_001.avi")))
    // the cut is the exact [start·640, end·640) sample range
    val decoded = Wav.decode(Files.readAllBytes(wav1))
    assert(decoded.sampleRate === 16000 && decoded.samples.length === 10 * 640)
    assert(decoded.samples(0) === MediaSinks.StubCutKernel.sourceSample(7L, 3L, 10L * 640))
    assert(decoded.samples(123) === MediaSinks.StubCutKernel.sourceSample(7L, 3L, 10L * 640 + 123))
    // manifest byte counts match the files on disk
    manifest.foreach { r =>
      assert(Files.size(Paths.get(r.getString(3))) === r.getLong(4), r.getString(3))
    }
  }

  test("face-crop sink lays out <video>/<entity>/<%.2f>.jpg with pixel-box payload") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_cropsink").toString
    val rows = Seq(("vidA", "vidA_ent1", 2.0 / 25 * 45, 0.25, 0.5, 0.75, 1.0))
      .toDF("video_key", "entity_id", "frame_timestamp", "x1", "y1", "x2", "y2")
    val m = MediaSinks.writeFaceCrops(spark, rows, out).collect()
    assert(m.length === 1)
    val p = Paths.get(out, "vidA", "vidA_ent1", "3.60.jpg") // 90/25 = 3.6 → %.2f
    assert(Files.exists(p), m.head.getString(3))
    // int(x·w) etc. from tools.py:180–184: 0.25·640=160, 0.5·360=180, …
    assert(new String(Files.readAllBytes(p), "UTF-8") === "STUBJPG 160,180,480,360")
  }

  test("frame dump uses the image2 %06d.jpg 1-based numbering") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_framesink").toString
    val frames = Seq((2L, 0L), (2L, 41L)).toDF("video_id", "frame")
    val m = MediaSinks.dumpFrames(spark, frames, out).collect()
    assert(m.length === 2)
    assert(Files.exists(Paths.get(out, "v00002", "pyframes", "000001.jpg")))
    assert(Files.exists(Paths.get(out, "v00002", "pyframes", "000042.jpg")))
  }
}
