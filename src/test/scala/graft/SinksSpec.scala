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

  test("crop-video sink: temp t.avi removed, mux = container+wav, real audio cut") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_cropvid").toString
    // one track: video 5, scene 1, track 2, frames 10..29
    val proc = (10 until 30).map(f => (5L, 1L, 2L, f, 100.0, 50.0, 20.0))
      .toDF("video_id", "scene_id", "track_id", "frame", "x", "y", "s")
    val m = MediaSinks.writeTrackCrops(spark, proc, out).collect()
    assert(m.length === 1)
    val dir = Paths.get(out, "v00005", "pycrop")
    assert(!Files.exists(dir.resolve("s001_t00002t.avi"))) // :212 temp removed
    val fin = dir.resolve("s001_t00002.avi")
    val wav = dir.resolve("s001_t00002.wav")
    assert(Files.exists(fin) && Files.exists(wav))
    // audio is the [10/25, 30/25) cut: 20 frames · 640 samples
    val decoded = Wav.decode(Files.readAllBytes(wav))
    assert(decoded.samples.length === 20 * 640)
    assert(decoded.samples(0) === MediaSinks.StubCutKernel.sourceSample(5L, 2L, 10L * 640))
    // container header: 224×224 @ 25, 20 frames
    val hdr = java.nio.ByteBuffer.wrap(Files.readAllBytes(fin), 4, 16) // after "MUX1"
    assert((hdr.getInt, hdr.getInt, hdr.getInt, hdr.getInt) === ((224, 224, 25, 20)))
    assert(m.head.getLong(4) === Files.size(fin) && m.head.getLong(5) === 20L * 640)
  }

  test("visualization sink: full frame range, :359–366 overlay semantics, a/v mux") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_vissink").toString
    // faces only on frames 1 and 3; video spans 0..3; one negative score
    val overlays = Seq((9L, 1, 0.5, 100.0, 50.0, 10.0), (9L, 3, -0.26, 200.0, 80.0, 15.0))
      .toDF("video_id", "frame", "score", "x", "y", "s")
    val m = MediaSinks.writeVisualization(spark, overlays, out).collect()
    assert(m.length === 1 && m.head.getLong(3) === 4L) // frames 0..3 all written
    val dir = Paths.get(out, "v00009", "pyavi")
    assert(Files.exists(dir.resolve("video_only.avi")) && Files.exists(dir.resolve("video_out.avi")))
    val hdr = java.nio.ByteBuffer.wrap(Files.readAllBytes(dir.resolve("video_only.avi")), 0, 16)
    assert((hdr.getInt, hdr.getInt, hdr.getInt, hdr.getInt) === ((640, 360, 25, 4)))
    // overlay record semantics re-derived independently
    val recs = (0 to 3).map { f =>
      val draws = overlays.collect().filter(r => r.getInt(1) == f).map { r =>
        val (sc, x, y, s) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
        val clr = if (sc >= 0) 255 else 0
        s"RECT ${(x - s).toInt},${(y - s).toInt},${(x + s).toInt},${(y + s).toInt} " +
          s"0,$clr,${255 - clr} TXT ${Math.rint(sc * 10) / 10}"
      }
      (s"VIS 9 $f " + draws.mkString("|")).getBytes("UTF-8")
    }
    // the stub container records (length, byte-sum) per frame — check them
    val bytes = Files.readAllBytes(dir.resolve("video_only.avi"))
    val bb = java.nio.ByteBuffer.wrap(bytes, 16, 8 * 4)
    recs.foreach { r =>
      assert(bb.getInt === r.length)
      assert(bb.getInt === (r.map(_ & 0xff).map(_.toLong).sum % 0x7fffffffL).toInt)
    }
  }

  /** Read every entry of every part-*.zip under `dir` as
    * relPath -> bytes. */
  private def zipEntries(dir: String): Map[String, Array[Byte]] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.matches("part-\\d+\\.zip")).flatMap { p =>
        val zf = new java.util.zip.ZipFile(p.toFile)
        val es = zf.entries().asScala.map { e =>
          e.getName -> zf.getInputStream(e).readAllBytes()
        }.toVector
        zf.close()
        es
      }.toMap
  }

  test("archive-mode segment sink: per-partition zips, per-file payloads and manifest preserved") {
    import spark.implicits._
    val outA = Files.createTempDirectory("graft_segzip").toString
    val outF = Files.createTempDirectory("graft_segfile").toString
    val segments = Seq((7L, 3L, 1L, 10L, 20L), (7L, 3L, 2L, 40L, 45L), (8L, 0L, 1L, 0L, 3L))
      .toDF("video_id", "track_id", "seg_id", "start_frame", "end_frame")
    val mA = MediaSinks.cutSegments(spark, segments, outA, mode = MediaSinks.Archive)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val mF = MediaSinks.cutSegments(spark, segments, outF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // manifests identical modulo path form; archive paths are <zip>!<entry>
    assert(mA.map(r => (r._1, r._2, r._3, r._5)).sorted.toSeq ===
      mF.map(r => (r._1, r._2, r._3, r._5)).sorted.toSeq)
    assert(mA.forall(_._4.contains(".zip!")))
    val entries = zipEntries(outA)
    assert(entries.size === 6) // avi + wav per segment
    // entry names preserve the reference layout; payloads match the
    // per-file mode files byte for byte
    mF.foreach { r =>
      val rel = Paths.get(outF).relativize(Paths.get(r._4)).toString
      assert(entries.contains(rel), rel)
      assert(entries(rel).toSeq === Files.readAllBytes(Paths.get(r._4)).toSeq, rel)
    }
    // and far fewer filesystem objects than entries
    assert(Files.list(Paths.get(outA)).count() <= spark.sparkContext.defaultParallelism)
  }

  test("archive-mode crop sink: zip entries equal per-file outputs, manifest bytes unchanged") {
    import spark.implicits._
    val outA = Files.createTempDirectory("graft_cropzip").toString
    val outF = Files.createTempDirectory("graft_cropfile").toString
    val proc = ((10 until 30).map(f => (5L, 1L, 2L, f, 100.0, 50.0, 20.0)) ++
        (0 until 15).map(f => (6L, 0L, 0L, f, 10.0, 10.0, 5.0)))
      .toDF("video_id", "scene_id", "track_id", "frame", "x", "y", "s")
    val mA = MediaSinks.writeTrackCrops(spark, proc, outA, mode = MediaSinks.Archive)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
    val mF = MediaSinks.writeTrackCrops(spark, proc, outF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
    assert(mA.map(r => (r._1, r._2, r._3, r._5, r._6)).sorted.toSeq ===
      mF.map(r => (r._1, r._2, r._3, r._5, r._6)).sorted.toSeq)
    val entries = zipEntries(outA)
    assert(entries.size === 4) // avi + wav per track
    mF.foreach { r =>
      val relAvi = Paths.get(outF).relativize(Paths.get(r._4)).toString
      val relWav = relAvi.stripSuffix(".avi") + ".wav"
      assert(entries(relAvi).toSeq === Files.readAllBytes(Paths.get(r._4)).toSeq)
      assert(entries(relWav).toSeq ===
        Files.readAllBytes(Paths.get(r._4.stripSuffix(".avi") + ".wav")).toSeq)
    }
  }

  test("archive-mode face-crop and frame-dump sinks preserve entry layout and payloads") {
    import spark.implicits._
    val outA = Files.createTempDirectory("graft_facezip").toString
    val rows = Seq(("vidA", "vidA_ent1", 2.0 / 25 * 45, 0.25, 0.5, 0.75, 1.0),
        ("vidA", "vidA_ent2", 0.04, 0.0, 0.0, 0.5, 0.5))
      .toDF("video_key", "entity_id", "frame_timestamp", "x1", "y1", "x2", "y2")
    val m = MediaSinks.writeFaceCrops(spark, rows, outA, mode = MediaSinks.Archive)
      .collect()
    assert(m.length === 2 && m.forall(_.getString(3).contains(".zip!")))
    val entries = zipEntries(outA)
    assert(new String(entries("vidA/vidA_ent1/3.60.jpg"), "UTF-8") === "STUBJPG 160,180,480,360")
    assert(new String(entries("vidA/vidA_ent2/0.04.jpg"), "UTF-8") === "STUBJPG 0,0,320,180")

    val outF = Files.createTempDirectory("graft_framezip").toString
    val frames = Seq((3L, 0L), (3L, 1L), (4L, 10L)).toDF("video_id", "frame")
    val mf = MediaSinks.dumpFrames(spark, frames, outF, mode = MediaSinks.Archive).collect()
    assert(mf.length === 3)
    val fe = zipEntries(outF)
    assert(new String(fe("v00003/pyframes/000001.jpg"), "UTF-8") === "STUBFRAME 3 0")
    assert(new String(fe("v00004/pyframes/000011.jpg"), "UTF-8") === "STUBFRAME 4 10")
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
