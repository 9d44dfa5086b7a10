package graft.sources

import graft.operators.Dedup

/** The media decode kernel contract — the seat for ffmpeg in the
  * reference's extraction stage (demoTalkNet.py:486–507): normalize
  * to a target fps (`-r 25`, :489–490) and, when a time range is
  * requested, decode only `-ss start -to end` (:491–493). The
  * container has no codecs, so the shipped decoder is a deterministic
  * stub — but the OPTION PLUMBING is the real API: a pushed
  * frame-range predicate from the Spark scan arrives here as
  * `DecodeRange`, exactly what a real ffmpeg/PyAV decoder needs to
  * seek instead of full-decoding. Swapping in a real codec means
  * implementing `FrameDecoder.decode` and nothing else.
  */
object Media {

  /** Inclusive frame range [startFrame, endFrame] at the normalized
    * fps; `ssSec`/`toSec` are the ffmpeg `-ss`/`-to` arguments it
    * corresponds to (demoTalkNet.py:492–493 formats them %.3f). */
  case class DecodeRange(startFrame: Long, endFrame: Long) {
    require(startFrame >= 0 && endFrame >= startFrame, s"bad range [$startFrame,$endFrame]")
    def ssSec(fps: Int): Double = startFrame.toDouble / fps
    def toSec(fps: Int): Double = (endFrame + 1).toDouble / fps
  }

  case class VideoMeta(key: Long, name: String, durationSec: Double)

  /** One normalized-fps frame: dense index, stub payload bytes, and
    * the per-frame kernel checksum (what a real decoder would compute
    * from pixel data; here a universal-hash so the SQL oracle can
    * mirror it). */
  case class Frame(frame: Long, payload: Array[Byte], checksum: Long)

  trait FrameDecoder extends Serializable {
    /** Decode `video` at `fps`, restricted to `range` when present.
      * MUST NOT materialize frames outside the range — that is the
      * whole point of the pushdown. */
    def decode(video: VideoMeta, fps: Int, range: Option[DecodeRange]): Iterator[Frame]
  }

  /** Universal-hash index for the frame checksum family — disjoint
    * from minhash (0..127), SimHash (200..263), ANN (1000+). */
  val ChecksumHashIdx = 777
  private val P32 = 4294967291L

  /** uhash(ChecksumHashIdx, key*100000 + frame) — mirrored in SQL by
    * Q.uhashSql("777", ...). Safe while key*100000+frame < 2^32. */
  def frameChecksum(key: Long, frame: Long): Long = {
    val (a, b) = Dedup.affine(ChecksumHashIdx)
    (a * (key * 100000L + frame) + b) % P32
  }

  /** Decoder-seat resolution for FrameSource's `decoder` option:
    * "stub" (default), "avi:<root>" for [[AviFileFrameDecoder]],
    * "mp4:<root>" for the pure-JVM [[Mp4FileFrameDecoder]],
    * "ffmpeg:<root>" for the shelling [[FfmpegFrameDecoder]] (any
    * container the executor's ffmpeg can read — h264/vp9/…), or
    * "auto:<root>" for per-file magic-byte dispatch between them. */
  def resolveDecoder(spec: String): FrameDecoder = spec match {
    case null | "" | "stub" => StubFrameDecoder
    case s if s.startsWith("avi:") => new AviFileFrameDecoder(s.substring(4))
    case s if s.startsWith("mp4:") => new Mp4FileFrameDecoder(s.substring(4))
    case s if s.startsWith("ffmpeg:") => new FfmpegFrameDecoder(s.substring(7))
    case s if s.startsWith("auto:") => new AutoFrameDecoder(s.substring(5))
    case other => throw new IllegalArgumentException(
      s"unknown frame decoder '$other' (want 'stub', 'avi:<root>', " +
        "'mp4:<root>', 'ffmpeg:<root>' or 'auto:<root>')")
  }

  /** `root/<name>`, falling back to `root/<name>.avi` then `.mp4` —
    * the shared resolution of the file-backed decoders. */
  private[sources] def resolveVideoPath(root: String, name: String): java.nio.file.Path = {
    val bare = java.nio.file.Paths.get(root, name)
    if (java.nio.file.Files.exists(bare)) bare
    else Seq(".avi", ".mp4").map(e => java.nio.file.Paths.get(root, name + e))
      .find(java.nio.file.Files.exists(_))
      .getOrElse(java.nio.file.Paths.get(root, name + ".avi"))
  }

  /** Container sniff from the first 12 bytes (the magic every demuxer
    * keys on): RIFF/AVI, ISO BMFF (mp4/mov ftyp at offset 4), EBML
    * (mkv/webm), MPEG-TS sync byte — anything else is "unknown". */
  def sniffContainer(path: java.nio.file.Path): String = {
    val in = java.nio.file.Files.newInputStream(path)
    val h = try in.readNBytes(12) finally in.close()
    def at(i: Int, s: String): Boolean =
      h.length >= i + s.length && s.indices.forall(k => (h(i + k) & 0xff) == s.charAt(k).toInt)
    if (at(0, "RIFF") && at(8, "AVI ")) "avi"
    else if (at(4, "ftyp")) "mp4"
    else if (h.length >= 4 && (h(0) & 0xff) == 0x1a && (h(1) & 0xff) == 0x45 &&
      (h(2) & 0xff) == 0xdf && (h(3) & 0xff) == 0xa3) "mkv"
    else if (h.length >= 1 && (h(0) & 0xff) == 0x47) "mpegts"
    else "unknown"
  }

  /** Decoder dispatch by CONTENT, not extension (demoTalkNet.py:
    * 486–494 accepts any container its ffmpeg can read): AVI magic →
    * the pure-JVM idx1-seek [[AviFileFrameDecoder]]; every other
    * container → the ffmpeg seat. The sniff costs one 12-byte read
    * per (file, task) — noise next to the decode itself — and removes
    * the manual `decoder=` choice for mixed corpora. */
  final class AutoFrameDecoder(root: String) extends FrameDecoder {
    override def decode(video: VideoMeta, fps: Int,
        range: Option[DecodeRange]): Iterator[Frame] = {
      val path = resolveVideoPath(root, video.name)
      require(java.nio.file.Files.isReadable(path), s"auto decoder: unreadable $path")
      val inner: FrameDecoder = sniffContainer(path) match {
        case "avi" => new AviFileFrameDecoder(root)
        case "mp4" => new Mp4FileFrameDecoder(root)
        case _ => new FfmpegFrameDecoder(root)
      }
      inner.decode(video, fps, range)
    }
  }

  /** REAL frame decoder over MP4/MOV files whose video samples are
    * JVM-decodable intra-frame payloads (PNG / JPEG sample entries —
    * the MJPEG-in-MP4 and PNG-in-MOV families): parses the box tree
    * with operators/Mp4Codec, seeks PAST mdat to moov, and
    * ranged-reads only the samples in the requested frame range
    * (Mp4Codec.decodeRangeFile — the -ss/-to pushdown honored at the
    * I/O layer, the same object-store-GET pattern as the AVI idx1
    * seek). Any OTHER codec inside the container (h264, av1, …)
    * needs a real decoder, so those files fall through to the ffmpeg
    * seat — dispatch by sample-entry fourcc from the PARSED stsd,
    * never by extension. */
  final class Mp4FileFrameDecoder(root: String) extends FrameDecoder {
    private val jvmCodecs = Set("png ", "PNG ", "jpeg", "MJPG", "mjpa")
    override def decode(video: VideoMeta, fps: Int,
        range: Option[DecodeRange]): Iterator[Frame] = {
      val path = resolveVideoPath(root, video.name)
      val (fourcc, _, _, _, _) = graft.operators.Mp4Codec.probeFile(path)
      if (!jvmCodecs.contains(fourcc))
        new FfmpegFrameDecoder(root).decode(video, fps, range)
      else {
        val lo = range.map(_.startFrame).getOrElse(0L)
        val hi = range.map(_.endFrame).getOrElse(Long.MaxValue - 1)
        graft.operators.Mp4Codec.decodeRangeFile(path, lo, hi)
          .iterator.zipWithIndex.map { case (payload, i) =>
            Frame(lo + i, payload, payloadChecksum(payload))
          }
      }
    }
  }

  /** Byte-payload checksum for REAL decoded frames: the same 31-base
    * poly fold as Dedup.polyHash, over bytes — what a real decoder
    * reports where the stub reports its uhash. */
  def payloadChecksum(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** REAL frame decoder over MJPG/PNG AVI files (operators/AviCodec):
    * resolves `root/<name>`, then uses the container's idx1 index to
    * SEEK to the requested frame range with genuinely RANGED reads
    * (AviCodec.decodeRangeFile: header walk + idx1 + one contiguous
    * span — the pattern that maps 1:1 onto object-store ranged GETs;
    * movi payload outside [lo, hi] is never read, honoring the
    * -ss/-to pushdown contract like the stub does). Frames outside
    * the container's count clamp exactly as the stub clamps to
    * durationSec·fps. Payload = the frame's compressed bytes (JPEG /
    * PNG — ImageCodec decodes them downstream); checksum =
    * payloadChecksum. */
  final class AviFileFrameDecoder(root: String) extends FrameDecoder {
    override def decode(video: VideoMeta, fps: Int,
        range: Option[DecodeRange]): Iterator[Frame] = {
      val path = resolveVideoPath(root, video.name)
      val lo = range.map(_.startFrame).getOrElse(0L)
      val hi = range.map(_.endFrame).getOrElse(Long.MaxValue - 1)
      graft.operators.AviCodec.decodeRangeFile(path, lo, hi)
        .iterator.zipWithIndex.map { case (payload, i) =>
          Frame(lo + i, payload, payloadChecksum(payload))
        }
    }
  }

  /** Deterministic stand-in for the ffmpeg decode: `durationSec * fps`
    * frames (floor), 16 payload bytes derived from the checksum. With
    * a range, generates ONLY [start, min(end, n-1)] — the seek
    * contract a real decoder honors via -ss/-to. */
  object StubFrameDecoder extends FrameDecoder {
    override def decode(video: VideoMeta, fps: Int,
        range: Option[Media.DecodeRange]): Iterator[Frame] = {
      val n = (video.durationSec * fps).toLong
      val lo = range.map(_.startFrame).getOrElse(0L)
      val hi = math.min(range.map(_.endFrame).getOrElse(n - 1), n - 1)
      (lo to hi).iterator.map { f =>
        val cs = frameChecksum(video.key, f)
        val payload = Array.tabulate[Byte](16)(j => ((cs + j * 31L) % 256L).toByte)
        Frame(f, payload, cs)
      }
    }
  }
}
