package graft.sources

import java.io.{File, InputStream}
import java.nio.file.{Files, Paths}

import graft.sources.Media.{DecodeRange, Frame, FrameDecoder, VideoMeta}

/** The ffmpeg-shelling decode seat for containers the pure-JVM codec
  * stack can't read (mp4/h264/…): mirrors the reference's extraction
  * commands (demoTalkNet.py:486–507 — `-r 25` fps normalize,
  * `-ss %.3f -to %.3f` range seek, `-qscale:v 2`) but streams PNG
  * frames over a pipe instead of writing `%06d.jpg` to disk, so the
  * decode feeds the Spark partition iterator directly with no
  * intermediate files.
  *
  * Availability-gated by design: construction succeeds anywhere (the
  * argv builder is pure and unit-tested); `decode` requires the
  * binary and fails with a clear message if it's missing. Deployments
  * with ffmpeg on the executor image register it as
  * `decoder = "ffmpeg:<root>"` on FrameSource and every downstream
  * operator (scene detect, face crops, A/V mux) is unchanged — the
  * range-pushdown plumbing already speaks `-ss/-to`.
  *
  * Scale: one process per (video, range) inside a partition iterator;
  * frames stream through a bounded pipe buffer — O(frame) memory, no
  * whole-video materialization, and ranged decode means a 2-second
  * clip of a 2-hour video costs seconds, not hours.
  */
final class FfmpegFrameDecoder(root: String, binary: String = "ffmpeg")
    extends FrameDecoder {

  override def decode(video: VideoMeta, fps: Int,
      range: Option[DecodeRange]): Iterator[Frame] = {
    // Same resolution as the AVI decoder and AutoFrameDecoder's sniff
    // (`root/<name>`, falling back to `root/<name>.avi`) — sniff and
    // decode MUST agree on the file, or a container reachable only
    // through the suffix fallback sniffs fine and then "unreadable"s
    // here (ADVICE r10).
    val path = Media.resolveVideoPath(root, video.name).toString
    require(Files.isReadable(Paths.get(path)), s"ffmpeg decoder: unreadable $path")
    val argv = FfmpegFrameDecoder.decodeArgv(binary, path, fps, range)
    val pb = new ProcessBuilder(argv: _*)
    pb.redirectError(ProcessBuilder.Redirect.to(new File("/dev/null")))
    val proc =
      try pb.start()
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"ffmpeg binary '$binary' not available on this executor " +
            s"(install it or use the 'avi:<root>' pure-JVM decoder)", e)
      }
    val first = range.map(_.startFrame).getOrElse(0L)
    val last = range.map(_.endFrame).getOrElse(Long.MaxValue)
    new Iterator[Frame] {
      private val in = proc.getInputStream
      private var idx = first
      private var nextPayload: Array[Byte] = _
      private var done = false
      private def advance(): Unit = {
        if (nextPayload == null && !done) {
          nextPayload =
            if (idx > last) null else FfmpegFrameDecoder.readPng(in).orNull
          if (nextPayload == null) {
            done = true
            in.close()
            proc.waitFor()
          }
        }
      }
      override def hasNext: Boolean = { advance(); nextPayload != null }
      override def next(): Frame = {
        advance()
        if (nextPayload == null) throw new NoSuchElementException
        val f = Frame(idx, nextPayload, Media.payloadChecksum(nextPayload))
        nextPayload = null
        idx += 1
        f
      }
    }
  }
}

object FfmpegFrameDecoder {
  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** The exact process argv (pure — unit-tested without the binary):
    * the reference's flags with image2pipe/png swapped for the
    * `%06d.jpg` image2 sink. `-ss/-to` precede nothing else touching
    * timing, matching demoTalkNet.py:492's output-side seek, and are
    * formatted %.3f like the reference. */
  def decodeArgv(binary: String, path: String, fps: Int,
      range: Option[DecodeRange]): Seq[String] = {
    val rangeArgs = range.toSeq.flatMap { r =>
      Seq("-ss", f"${r.ssSec(fps)}%.3f", "-to", f"${r.toSec(fps)}%.3f")
    }
    Seq(binary, "-nostdin", "-y", "-i", path, "-qscale:v", "2") ++
      rangeArgs ++
      Seq("-async", "1", "-r", fps.toString,
        "-f", "image2pipe", "-vcodec", "png", "pipe:1", "-loglevel", "panic")
  }

  /** Audio-extraction argv (demoTalkNet.py:499–501: mono 16 kHz wav). */
  def audioArgv(binary: String, videoPath: String, wavPath: String): Seq[String] =
    Seq(binary, "-nostdin", "-y", "-i", videoPath, "-qscale:a", "0",
      "-ac", "1", "-vn", "-ar", "16000", wavPath, "-loglevel", "panic")

  /** Read exactly one PNG (signature + chunks through IEND) from a
    * stream of concatenated PNGs; None at clean EOF. */
  def readPng(in: InputStream): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val sig = new Array[Byte](8)
    var got = 0
    while (got < 8) {
      val n = in.read(sig, got, 8 - got)
      if (n < 0) {
        if (got == 0) return None
        throw new java.io.EOFException(s"truncated PNG signature ($got bytes)")
      }
      got += n
    }
    require(java.util.Arrays.equals(sig, PngSig), "pipe is not a PNG stream")
    out.write(sig)
    var sawEnd = false
    val hdr = new Array[Byte](8)
    while (!sawEnd) {
      readFully(in, hdr)
      out.write(hdr)
      val len = ((hdr(0) & 0xff) << 24) | ((hdr(1) & 0xff) << 16) |
        ((hdr(2) & 0xff) << 8) | (hdr(3) & 0xff)
      require(len >= 0, "corrupt PNG chunk length")
      val body = new Array[Byte](len + 4) // data + crc
      readFully(in, body)
      out.write(body)
      sawEnd = hdr(4) == 'I' && hdr(5) == 'E' && hdr(6) == 'N' && hdr(7) == 'D'
    }
    Some(out.toByteArray)
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var got = 0
    while (got < buf.length) {
      val n = in.read(buf, got, buf.length - got)
      if (n < 0) throw new java.io.EOFException("truncated PNG chunk")
      got += n
    }
  }
}
