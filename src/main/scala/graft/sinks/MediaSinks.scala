package graft.sinks

import graft.sources.Wav
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed media file sinks — the reference's per-file output
  * kernels re-expressed as partition kernels that write from the
  * executors and hand back a MANIFEST DataFrame (path + bytes), the
  * receipt a 1000-executor run needs (a driver-side loop over files,
  * the reference's shape, cannot scale past one machine):
  *
  *  - segment sink (extractSpeakingSegments.py:117–139): per speaking
  *    segment, `track_%05d_segment_%03d.avi` + `.wav` cut from the
  *    track media at [start_frame/25, end_frame/25);
  *  - face-crop image sink (utils/tools.py:163–186):
  *    `<out>/<video>/<entity>/<%.2f ts>.jpg` per row;
  *  - frame dump (demoTalkNet.py:506, ffmpeg -f image2):
  *    `<out>/<video>/%06d.jpg`.
  *
  * The ffmpeg/jpg encode seats are stubs; the WAV cut is REAL (the
  * sample-range arithmetic + PCM encode any codec swap-in keeps).
  * `outDir` must be a shared filesystem on a real cluster (same
  * contract as Q.scratchDir).
  */
object MediaSinks {

  /** The ffmpeg -ss/-t cut seat (extractSpeakingSegments.py:127–139).
    * Returns (path, bytesWritten) per file produced. */
  trait SegmentCutKernel extends Serializable {
    def cut(videoId: Long, trackId: Long, segIdx: Long,
        startFrame: Long, endFrame: Long, outDir: String): Seq[(String, Long)]
  }

  /** Stub cutter: the AVI is a deterministic placeholder container
    * (64 + 128·n_frames bytes — a real kernel shells
    * `ffmpeg -ss %.3f -t %.3f -c copy`); the WAV is a REAL cut — the
    * track's 16 kHz source PCM sliced at [startFrame·640,
    * endFrame·640) (640 = 16000/25 samples per frame) and encoded
    * with the repo's WAV codec, exactly the byte ranges ffmpeg's
    * stream copy would keep. */
  object StubCutKernel extends SegmentCutKernel {
    /** Deterministic per-track source sample (a stand-in for the
      * cropped track's audio). */
    def sourceSample(videoId: Long, trackId: Long, i: Long): Short =
      (((videoId * 31L + trackId * 17L + i * 2654435761L) % 16384L) - 8192L).toShort

    override def cut(videoId: Long, trackId: Long, segIdx: Long,
        startFrame: Long, endFrame: Long, outDir: String): Seq[(String, Long)] = {
      val base = f"track_$trackId%05d_segment_$segIdx%03d" // :120–121 naming
      val dir = java.nio.file.Paths.get(outDir, f"v$videoId%05d")
      java.nio.file.Files.createDirectories(dir)
      val avi = dir.resolve(base + ".avi")
      val nFrames = endFrame - startFrame
      val aviBytes = new Array[Byte]((64 + 128 * nFrames).toInt)
      java.util.Arrays.fill(aviBytes, 'A'.toByte)
      java.nio.file.Files.write(avi, aviBytes)
      val pcm = Array.tabulate((nFrames * 640).toInt)(j =>
        sourceSample(videoId, trackId, startFrame * 640 + j))
      val wavBytes = Wav.encode(16000, 1, pcm)
      val wav = dir.resolve(base + ".wav")
      java.nio.file.Files.write(wav, wavBytes)
      Seq(avi.toString -> aviBytes.length.toLong, wav.toString -> wavBytes.length.toLong)
    }
  }

  /** Segment sink: one kernel call per segment row, executed on the
    * executors (mapPartitions), manifest back. Expects columns
    * video_id, track_id, seg_id, start_frame, end_frame. */
  def cutSegments(spark: SparkSession, segments: DataFrame, outDir: String,
      kernel: SegmentCutKernel = StubCutKernel): DataFrame = {
    import spark.implicits._
    segments.select(col("video_id").cast("long"), col("track_id").cast("long"),
        col("seg_id").cast("long"), col("start_frame").cast("long"),
        col("end_frame").cast("long"))
      .as[(Long, Long, Long, Long, Long)]
      .mapPartitions(_.flatMap { case (v, t, s, sf, ef) =>
        kernel.cut(v, t, s, sf, ef, outDir).map { case (p, b) => (v, t, s, p, b) }
      })
      .toDF("video_id", "track_id", "seg_id", "path", "n_bytes")
  }

  /** Face-crop image sink (utils/tools.py:163–186): per row a stub
    * jpg at `<out>/<video_key>/<entity_id>/<%.2f ts>.jpg`. Timestamps
    * are k/25 s, whose shortest repr has ≤ 2 decimals — %.2f is
    * engine-stable for them. The stub payload embeds the pixel crop
    * box (x1·w, y1·h, x2·w, y2·h ints, tools.py:180–184) so the
    * geometry contract survives the stub. */
  def writeFaceCrops(spark: SparkSession, rows: DataFrame, outDir: String,
      frameW: Int = 640, frameH: Int = 360): DataFrame = {
    import spark.implicits._
    rows.select(col("video_key").cast("string"), col("entity_id").cast("string"),
        col("frame_timestamp").cast("double"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"))
      .as[(String, String, Double, Double, Double, Double, Double)]
      .mapPartitions(_.map { case (vk, ent, ts, x1, y1, x2, y2) =>
        val dir = java.nio.file.Paths.get(outDir, vk, ent)
        java.nio.file.Files.createDirectories(dir)
        val name = f"$ts%.2f.jpg" // tools.py:175 naming
        val px = Seq((x1 * frameW).toInt, (y1 * frameH).toInt,
          (x2 * frameW).toInt, (y2 * frameH).toInt) // :180–184 int() casts
        val payload = s"STUBJPG ${px.mkString(",")}".getBytes("UTF-8")
        val p = dir.resolve(name)
        java.nio.file.Files.write(p, payload)
        (vk, ent, ts, p.toString, payload.length.toLong)
      })
      .toDF("video_key", "entity_id", "frame_timestamp", "path", "n_bytes")
  }

  /** Frame dump sink (demoTalkNet.py:506): `%06d.jpg` per frame under
    * the video's dir — the `-f image2` naming contract. */
  def dumpFrames(spark: SparkSession, frames: DataFrame, outDir: String): DataFrame = {
    import spark.implicits._
    frames.select(col("video_id").cast("long"), col("frame").cast("long"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (v, f) =>
        val dir = java.nio.file.Paths.get(outDir, f"v$v%05d", "pyframes")
        java.nio.file.Files.createDirectories(dir)
        val p = dir.resolve(f"${f + 1}%06d.jpg") // image2 numbering is 1-based
        java.nio.file.Files.write(p, s"STUBFRAME $v $f".getBytes("UTF-8"))
        (v, f, p.toString)
      })
      .toDF("video_id", "frame", "path")
  }
}
