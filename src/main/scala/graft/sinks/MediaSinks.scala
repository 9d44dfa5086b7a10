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

  /** Output layout of the file sinks.
    *
    *  - [[PerFile]] (default): one filesystem file per entry — the
    *    reference's exact on-disk contract
    *    (extractSpeakingSegments.py:118–139 naming).
    *  - [[Archive]]: one zip per Spark PARTITION, entry names
    *    preserving the per-file relative layout inside the archive.
    *    At 100 TB the per-file mode is a small-files storm (an object
    *    store pays a request per file; this VM's throttle pays a
    *    budget token per create) — archive mode turns ~N tiny writes
    *    into numPartitions sequential streams. Manifest rows are
    *    IDENTICAL in both modes (n_bytes = logical payload bytes;
    *    path gains a `<zip>!<entry>` suffix form), so the oracle
    *    byte formulas hold unchanged. */
  sealed trait SinkMode extends Serializable
  case object PerFile extends SinkMode
  case object Archive extends SinkMode

  /** One partition's zip, created lazily on the first entry so empty
    * partitions leave no file. Entries are framed DEFLATED but at
    * NO_COMPRESSION — media payloads are already codec-compressed
    * (and the stub PCM is hash noise), so a real deflate pass burns
    * CPU for ~0% ratio; level 0 makes the archive a sequential
    * memcpy-speed stream. Manifest sizes report the logical payload
    * (= per-file mode bytes) either way. */
  private final class PartitionZip(outDir: String) {
    private var zos: java.util.zip.ZipOutputStream = null
    private var zipPath: String = null   // final (manifest-visible) path
    private var tmpPath: java.nio.file.Path = null // attempt-unique staging
    def path: String = zipPath
    def add(relPath: String, payload: Array[Byte]): String = {
      if (zos == null) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val dir = java.nio.file.Paths.get(outDir)
        java.nio.file.Files.createDirectories(dir)
        zipPath = dir.resolve(f"part-$pid%05d.zip").toString
        // stream to an ATTEMPT-UNIQUE temp and rename on close: a
        // speculative duplicate or retried attempt writing the final
        // name directly would interleave bytes into one corrupt zip;
        // with staging each attempt renames a COMPLETE file (last
        // rename wins — both carry identical content)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId).getOrElse(Thread.currentThread().getId)
        tmpPath = dir.resolve(f".part-$pid%05d-attempt-$attempt.zip.tmp")
        zos = new java.util.zip.ZipOutputStream(
          new java.io.BufferedOutputStream(
            java.nio.file.Files.newOutputStream(tmpPath), 1 << 16))
        zos.setLevel(java.util.zip.Deflater.NO_COMPRESSION)
      }
      zos.putNextEntry(new java.util.zip.ZipEntry(relPath))
      zos.write(payload)
      zos.closeEntry()
      s"$zipPath!$relPath"
    }
    def close(): Unit = if (zos != null) {
      zos.close()
      java.nio.file.Files.move(tmpPath, java.nio.file.Paths.get(zipPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Per-partition entry writer dispatching on [[SinkMode]]: PerFile
    * lays entries out as real files under `outDir`; Archive streams
    * them into the partition's zip. Both return the manifest path. */
  private final class EntrySink(mode: SinkMode, outDir: String) {
    private val zip: PartitionZip =
      if (mode == Archive) new PartitionZip(outDir) else null
    def put(rel: String, payload: Array[Byte]): String = mode match {
      case PerFile =>
        val p = java.nio.file.Paths.get(outDir, rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, payload)
        p.toString
      case Archive => zip.add(rel, payload)
    }
    def close(): Unit = if (zip != null) zip.close()
  }

  /** The ffmpeg -ss/-t cut seat (extractSpeakingSegments.py:127–139).
    * Returns (path, bytesWritten) per file produced. */
  trait SegmentCutKernel extends Serializable {
    def cut(videoId: Long, trackId: Long, segIdx: Long,
        startFrame: Long, endFrame: Long, outDir: String): Seq[(String, Long)]

    /** The kernel's entries as (relative path, payload) WITHOUT
      * touching the filesystem — the seat archive mode consumes.
      * Default: not supported (a real ffmpeg kernel shells out and
      * must override or stay per-file). */
    def render(videoId: Long, trackId: Long, segIdx: Long,
        startFrame: Long, endFrame: Long): Seq[(String, Array[Byte])] =
      throw new UnsupportedOperationException(
        s"${getClass.getName}: archive mode needs render()")
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

    override def render(videoId: Long, trackId: Long, segIdx: Long,
        startFrame: Long, endFrame: Long): Seq[(String, Array[Byte])] = {
      val base = f"track_$trackId%05d_segment_$segIdx%03d" // :120–121 naming
      val rel = f"v$videoId%05d/$base"
      val nFrames = endFrame - startFrame
      val aviBytes = new Array[Byte]((64 + 128 * nFrames).toInt)
      java.util.Arrays.fill(aviBytes, 'A'.toByte)
      val pcm = Array.tabulate((nFrames * 640).toInt)(j =>
        sourceSample(videoId, trackId, startFrame * 640 + j))
      val wavBytes = Wav.encode(16000, 1, pcm)
      Seq(s"$rel.avi" -> aviBytes, s"$rel.wav" -> wavBytes)
    }

    override def cut(videoId: Long, trackId: Long, segIdx: Long,
        startFrame: Long, endFrame: Long, outDir: String): Seq[(String, Long)] =
      render(videoId, trackId, segIdx, startFrame, endFrame).map {
        case (rel, payload) =>
          val p = java.nio.file.Paths.get(outDir, rel)
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, payload)
          p.toString -> payload.length.toLong
      }
  }

  /** Segment sink: one kernel call per segment row, executed on the
    * executors (mapPartitions), manifest back. Expects columns
    * video_id, track_id, seg_id, start_frame, end_frame. */
  def cutSegments(spark: SparkSession, segments: DataFrame, outDir: String,
      kernel: SegmentCutKernel = StubCutKernel,
      mode: SinkMode = PerFile): DataFrame = {
    import spark.implicits._
    val in = segments.select(col("video_id").cast("long"), col("track_id").cast("long"),
        col("seg_id").cast("long"), col("start_frame").cast("long"),
        col("end_frame").cast("long"))
      .as[(Long, Long, Long, Long, Long)]
    val out = mode match {
      case PerFile => in.mapPartitions(_.flatMap { case (v, t, s, sf, ef) =>
        kernel.cut(v, t, s, sf, ef, outDir).map { case (p, b) => (v, t, s, p, b) }
      })
      case Archive => in.mapPartitions { it =>
        val zip = new PartitionZip(outDir)
        val rows = it.flatMap { case (v, t, s, sf, ef) =>
          kernel.render(v, t, s, sf, ef).map { case (rel, payload) =>
            (v, t, s, zip.add(rel, payload), payload.length.toLong)
          }
        }.toVector // drain before closing the zip
        zip.close()
        rows.iterator
      }
    }
    out.toDF("video_id", "track_id", "seg_id", "path", "n_bytes")
  }

  /** Face-crop image sink (utils/tools.py:163–186): per row a stub
    * jpg at `<out>/<video_key>/<entity_id>/<%.2f ts>.jpg`. Timestamps
    * are k/25 s, whose shortest repr has ≤ 2 decimals — %.2f is
    * engine-stable for them. The stub payload embeds the pixel crop
    * box (x1·w, y1·h, x2·w, y2·h ints, tools.py:180–184) so the
    * geometry contract survives the stub. */
  def writeFaceCrops(spark: SparkSession, rows: DataFrame, outDir: String,
      frameW: Int = 640, frameH: Int = 360, mode: SinkMode = PerFile): DataFrame = {
    import spark.implicits._
    rows.select(col("video_key").cast("string"), col("entity_id").cast("string"),
        col("frame_timestamp").cast("double"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"))
      .as[(String, String, Double, Double, Double, Double, Double)]
      .mapPartitions { it =>
        val sink = new EntrySink(mode, outDir)
        val out = it.map { case (vk, ent, ts, x1, y1, x2, y2) =>
          val name = f"$ts%.2f.jpg" // tools.py:175 naming
          val px = Seq((x1 * frameW).toInt, (y1 * frameH).toInt,
            (x2 * frameW).toInt, (y2 * frameH).toInt) // :180–184 int() casts
          val payload = s"STUBJPG ${px.mkString(",")}".getBytes("UTF-8")
          val p = sink.put(s"$vk/$ent/$name", payload)
          (vk, ent, ts, p, payload.length.toLong)
        }.toVector // drain before closing the zip
        sink.close()
        out.iterator
      }
      .toDF("video_key", "entity_id", "frame_timestamp", "path", "n_bytes")
  }

  /** The cv2.VideoWriter seat (XVID in the reference). The stub
    * container is deterministic: a 16-byte header (w, h, fps, n as
    * ints) then an 8-byte (length, byte-sum) record per frame — a
    * real impl wraps JavaCV/ffmpeg and everything around it keeps. */
  trait VideoEncoder extends Serializable {
    def encode(width: Int, height: Int, fps: Int, frames: Iterator[Array[Byte]]): Array[Byte]
  }

  object StubVideoEncoder extends VideoEncoder {
    override def encode(width: Int, height: Int, fps: Int,
        frames: Iterator[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val buf = java.nio.ByteBuffer.allocate(16)
        .putInt(width).putInt(height).putInt(fps).putInt(0)
      out.write(buf.array())
      var n = 0
      frames.foreach { f =>
        var s = 0L; var i = 0
        while (i < f.length) { s += (f(i) & 0xff); i += 1 }
        out.write(java.nio.ByteBuffer.allocate(8)
          .putInt(f.length).putInt((s % 0x7fffffffL).toInt).array())
        n += 1
      }
      val bytes = out.toByteArray
      java.nio.ByteBuffer.wrap(bytes, 12, 4).putInt(n) // patch frame count
      bytes
    }
  }

  /** REAL VideoEncoder seat: a spec-correct RIFF/AVI container
    * (operators/AviCodec — hdrl/movi/idx1, even-padded chunks) around
    * intra-frame payloads. JPEG frames pass through as `MJPG` (cv2's
    * classic codec-free fallback for the :184 VideoWriter); anything
    * else is wrapped losslessly as `PNG ` (ffmpeg's PNG-in-AVI tag) —
    * real images via ImageIO, non-image fixture payloads rendered to
    * a deterministic byte-cycle raster first. One seat for fixtures
    * and real media, the ImageCodec pattern one container level up;
    * drop-in for writeTrackCrops/writeVisualization (q68's stub
    * default stays, its oracle pins the stub byte formula). */
  object AviVideoEncoder extends VideoEncoder {
    import graft.operators.{AviCodec, ImageCodec}
    override def encode(width: Int, height: Int, fps: Int,
        frames: Iterator[Array[Byte]]): Array[Byte] = {
      val fs = frames.toVector
      val allJpeg = fs.nonEmpty && fs.forall(ImageCodec.isJpeg)
      if (allJpeg) AviCodec.encode(width, height, fps, "MJPG", fs)
      else AviCodec.encode(width, height, fps, "PNG ", fs.map { f =>
        if (ImageCodec.isPng(f)) f
        else if (ImageCodec.isImage(f)) {
          // real JPEG/BMP in a mixed batch: transcode losslessly via
          // ImageIO instead of treating the bytes as fixture payload
          val (h, w, px) = ImageCodec.decodeBgr(f)
          ImageCodec.encodePng(px, h, w)
        } else {
          val n = math.max(f.length, 1)
          val raster = Array.tabulate(height * width * 3)(k =>
            if (f.isEmpty) 0 else f(k % n) & 0xff)
          ImageCodec.encodePng(raster, height, width)
        }
      })
    }
  }

  /** Crop-video sink (demoTalkNet.py:180–213 crop_video): per track —
    * render the 224×224 crop frames into a temp `<base>t.avi`
    * container, cut the track's audio [first/25, (last+1)/25) as a
    * REAL 16 kHz WAV slice (the -ss/-to of :208), "mux" a/v into
    * `<base>.avi` (stub: container ++ wav under a MUX header; real:
    * ffmpeg -c copy), delete the temp, keep the WAV (the reference
    * keeps it for evaluate_network). Files are named per
    * (scene, track) — the distributed stand-in for the reference's
    * global track ordinal, which would need a global sort. Expects
    * procTracks columns (video_id, scene_id, track_id, frame, x, y, s). */
  def writeTrackCrops(spark: SparkSession, procTracks: DataFrame, outDir: String,
      encoder: VideoEncoder = StubVideoEncoder,
      mode: SinkMode = PerFile): DataFrame = {
    import spark.implicits._
    // Stage 1 (per track, in-memory): render the container, cut the
    // audio, mux — no filesystem contact, so both layouts share it.
    val rendered = procTracks.select(col("video_id").cast("long"), col("scene_id").cast("long"),
        col("track_id").cast("long"), col("frame").cast("int"),
        col("x").cast("double"), col("y").cast("double"), col("s").cast("double"))
      .as[(Long, Long, Long, Int, Double, Double, Double)]
      .groupByKey(r => (r._1, r._2, r._3))
      .mapGroups { (key: (Long, Long, Long), it: Iterator[(Long, Long, Long, Int, Double, Double, Double)]) =>
        val (v, sc, t) = key
        val rows = it.toArray.sortBy(_._4)
        val base = f"s$sc%03d_t$t%05d"
        // stub "rendered" 224×224 frame: the crop geometry as bytes
        val container = encoder.encode(224, 224, 25, rows.iterator.map { r =>
          s"CROP $v $sc $t ${r._4} ${r._5} ${r._6} ${r._7}".getBytes("UTF-8")
        })
        // The reference writes `<base>t.avi`, muxes, then os.remove()s
        // it (demoTalkNet.py:207–213) because ffmpeg needs real files;
        // the stub encoder's container is already in memory, so the
        // write+delete would be two filesystem ops per track for
        // nothing — a REAL encoder seat reintroduces its own temp
        // files kernel-internally. End state is identical (the spec
        // asserts `<base>t.avi` does not exist).
        // audio cut: [first·640, (last+1)·640) of the track source PCM
        val first = rows.head._4.toLong; val last = rows.last._4.toLong
        val pcm = Array.tabulate(((last + 1 - first) * 640).toInt)(j =>
          StubCutKernel.sourceSample(v, t, first * 640 + j))
        val wavBytes = Wav.encode(16000, 1, pcm)
        // mux (stub concat, oracle-pinned; the REAL two-stream mux is
        // AviCodec.encode(..., Some((rate, pcm))) — q129 proves it —
        // and swaps in with the AviVideoEncoder seat)
        val out = new java.io.ByteArrayOutputStream()
        out.write("MUX1".getBytes("UTF-8")); out.write(container); out.write(wavBytes)
        (v, sc, t, f"v$v%05d/pycrop/$base", out.toByteArray, wavBytes, pcm.length.toLong)
      }
    // Stage 2 (same stage, pipelined — no shuffle between the group
    // kernel and the writer): lay the rendered entries out per `mode`.
    val written = mode match {
      case PerFile => rendered.mapPartitions(_.map {
        case (v, sc, t, relBase, aviPayload, wavPayload, samples) =>
          val p = java.nio.file.Paths.get(outDir, relBase + ".avi")
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(
            p.resolveSibling(p.getFileName.toString.stripSuffix(".avi") + ".wav"),
            wavPayload)
          java.nio.file.Files.write(p, aviPayload)
          (v, sc, t, p.toString, aviPayload.length.toLong, samples)
      })
      case Archive => rendered.mapPartitions { it =>
        val zip = new PartitionZip(outDir)
        val rows = it.map { case (v, sc, t, relBase, aviPayload, wavPayload, samples) =>
          zip.add(relBase + ".wav", wavPayload)
          val p = zip.add(relBase + ".avi", aviPayload)
          (v, sc, t, p, aviPayload.length.toLong, samples)
        }.toVector // drain before closing the zip
        zip.close()
        rows.iterator
      }
    }
    written.toDF("video_id", "scene_id", "track_id", "path", "n_bytes", "wav_samples")
  }

  /** Visualization sink (demoTalkNet.py:342–370): one overlay video
    * per video. Each frame's overlay records mirror :360–366 — color
    * (0, clr, 255−clr) with clr = 255 iff score ≥ 0, label
    * round(score, 1), rectangle ints (x−s, y−s)–(x+s, y+s); then the
    * container muxes with the video's full audio track. Expects
    * columns (video_id, frame, score, x, y, s); multiple faces per
    * frame allowed (ordered by (frame, x)). */
  def writeVisualization(spark: SparkSession, overlays: DataFrame, outDir: String,
      encoder: VideoEncoder = StubVideoEncoder, frameW: Int = 640, frameH: Int = 360): DataFrame = {
    import spark.implicits._
    overlays.select(col("video_id").cast("long"), col("frame").cast("int"),
        col("score").cast("double"), col("x").cast("double"),
        col("y").cast("double"), col("s").cast("double"))
      .as[(Long, Int, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (v: Long, it: Iterator[(Long, Int, Double, Double, Double, Double)]) =>
        val rows = it.toArray.sortBy(r => (r._2, r._4))
        val dir = java.nio.file.Paths.get(outDir, f"v$v%05d", "pyavi")
        java.nio.file.Files.createDirectories(dir)
        val byFrame = rows.groupBy(_._2)
        val maxFrame = rows.map(_._2).max
        val container = encoder.encode(frameW, frameH, 25,
          (0 to maxFrame).iterator.map { f =>
            val draws = byFrame.getOrElse(f, Array.empty).map { r =>
              val clr = if (r._3 >= 0) 255 else 0 // :359–360
              s"RECT ${(r._4 - r._6).toInt},${(r._5 - r._6).toInt}," +
                s"${(r._4 + r._6).toInt},${(r._5 + r._6).toInt} 0,$clr,${255 - clr} " +
                s"TXT ${Math.rint(r._3 * 10) / 10}" // :364 round(score,1)
            }
            (s"VIS $v $f " + draws.mkString("|")).getBytes("UTF-8")
          })
        java.nio.file.Files.write(dir.resolve("video_only.avi"), container)
        val pcm = Array.tabulate((maxFrame + 1) * 640)(j =>
          StubCutKernel.sourceSample(v, -1L, j.toLong))
        val out = new java.io.ByteArrayOutputStream()
        out.write("MUX1".getBytes("UTF-8")); out.write(container)
        out.write(Wav.encode(16000, 1, pcm))
        val fin = dir.resolve("video_out.avi")
        java.nio.file.Files.write(fin, out.toByteArray)
        (v, fin.toString, java.nio.file.Files.size(fin), (maxFrame + 1).toLong)
      }
      .toDF("video_id", "path", "n_bytes", "n_frames")
  }

  /** Frame dump sink (demoTalkNet.py:506): `%06d.jpg` per frame under
    * the video's dir — the `-f image2` naming contract. */
  def dumpFrames(spark: SparkSession, frames: DataFrame, outDir: String,
      mode: SinkMode = PerFile): DataFrame = {
    import spark.implicits._
    frames.select(col("video_id").cast("long"), col("frame").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val sink = new EntrySink(mode, outDir)
        val out = it.map { case (v, f) =>
          // image2 numbering is 1-based
          val p = sink.put(f"v$v%05d/pyframes/${f + 1}%06d.jpg",
            s"STUBFRAME $v $f".getBytes("UTF-8"))
          (v, f, p)
        }.toVector // drain before closing the zip
        sink.close()
        out.iterator
      }
      .toDF("video_id", "frame", "path")
  }
}
