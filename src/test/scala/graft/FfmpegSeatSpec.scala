package graft

import java.io.ByteArrayInputStream

import graft.sources.{FfmpegFrameDecoder, Media}
import org.scalatest.funsuite.AnyFunSuite

/** The ffmpeg-shelling decode seat: argv construction mirrors the
  * reference's extraction commands (demoTalkNet.py:486–507), the
  * PNG pipe splitter reassembles exact frame payloads, and — when an
  * ffmpeg binary is present on the machine — a real mp4 decode runs
  * end to end (cancelled, not failed, in binary-free sandboxes). */
class FfmpegSeatSpec extends AnyFunSuite {

  test("decode argv mirrors the reference flags incl. %.3f -ss/-to") {
    val a = FfmpegFrameDecoder.decodeArgv("ffmpeg", "/v/x.mp4", 25,
      Some(Media.DecodeRange(50, 99)))
    assert(a.containsSlice(Seq("-ss", "2.000", "-to", "4.000")))
    assert(a.containsSlice(Seq("-r", "25")))
    assert(a.containsSlice(Seq("-qscale:v", "2")))
    assert(a.containsSlice(Seq("-f", "image2pipe", "-vcodec", "png", "pipe:1")))
    val full = FfmpegFrameDecoder.decodeArgv("ffmpeg", "/v/x.mp4", 25, None)
    assert(!full.contains("-ss") && !full.contains("-to"))
    val audio = FfmpegFrameDecoder.audioArgv("ffmpeg", "/v/x.mp4", "/tmp/a.wav")
    assert(audio.containsSlice(Seq("-ac", "1")) && audio.containsSlice(Seq("-ar", "16000")))
  }

  test("readPng splits a concatenated PNG stream into exact payloads") {
    val p1 = graft.operators.ImageCodec.encodePng(
      Array.tabulate(4 * 3)(i => i * 17 % 256), 2, 2)
    val p2 = graft.operators.ImageCodec.encodePng(
      Array.tabulate(9 * 3)(i => i * 31 % 256), 3, 3)
    val in = new ByteArrayInputStream(p1 ++ p2)
    assert(FfmpegFrameDecoder.readPng(in).get.toSeq == p1.toSeq)
    assert(FfmpegFrameDecoder.readPng(in).get.toSeq == p2.toSeq)
    assert(FfmpegFrameDecoder.readPng(in).isEmpty)
  }

  test("readPng rejects a non-PNG pipe") {
    val in = new ByteArrayInputStream("MJPGMJPGMJPG".getBytes)
    intercept[IllegalArgumentException] { FfmpegFrameDecoder.readPng(in) }
  }

  test("MP4 h264 fourcc falls through to the ffmpeg seat by PARSED stsd " +
      "(cancelled without a binary)") {
    // the AVI seat test's MP4 sibling (round-15 verdict task 8): the
    // Mp4FileFrameDecoder dispatches on the fourcc parsed from the
    // moov's stsd sample entry — never the extension — so a real
    // codec inside the container must reach the ffmpeg seat.
    val have = sys.env.getOrElse("PATH", "").split(':')
      .exists(p => new java.io.File(p, "ffmpeg").canExecute)
    assume(have, "no ffmpeg binary on this machine")
    val dir = java.nio.file.Files.createTempDirectory("ffm4").toString
    // let ffmpeg itself author a REAL codec-bearing mp4 from PNG input
    for (f <- 0 until 5) {
      val png = graft.operators.ImageCodec.encodePng(
        Array.tabulate(16 * 16 * 3)(i => (i + f * 7) % 256), 16, 16)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"in$f%06d.png"), png)
    }
    val enc = new ProcessBuilder("ffmpeg", "-y", "-framerate", "25",
      "-i", s"$dir/in%06d.png", "-pix_fmt", "yuv420p", s"$dir/v.mp4")
      .redirectErrorStream(true).start()
    enc.getInputStream.readAllBytes()
    assume(enc.waitFor() == 0, "ffmpeg could not encode the fixture mp4")
    // the parsed stsd fourcc is a real codec, not a JVM-decodable one
    val (fourcc, _, _, _, n) = graft.operators.Mp4Codec.probeFile(
      java.nio.file.Paths.get(dir, "v.mp4"))
    assert(!Set("png ", "PNG ", "jpeg", "MJPG", "mjpa").contains(fourcc),
      s"expected a codec fourcc, got '$fourcc'")
    assert(n == 5)
    // and the MP4 decoder reaches the seat and decodes for real
    val dec = new Media.Mp4FileFrameDecoder(dir)
    val out = dec.decode(Media.VideoMeta(1L, "v.mp4", 0.2), 25, None).toSeq
    assert(out.nonEmpty && out.forall(_.payload.length > 8))
  }

  test("real decode when an ffmpeg binary exists (cancelled without one)") {
    val have = sys.env.getOrElse("PATH", "").split(':')
      .exists(p => new java.io.File(p, "ffmpeg").canExecute)
    assume(have, "no ffmpeg binary on this machine")
    // synthesize an AVI with the repo's own encoder, decode via ffmpeg
    val dir = java.nio.file.Files.createTempDirectory("ffm").toString
    val frames = Seq.tabulate(5)(f =>
      graft.operators.ImageCodec.encodePng(
        Array.tabulate(16 * 16 * 3)(i => (i + f * 7) % 256), 16, 16))
    val avi = graft.operators.AviCodec.encode(16, 16, 25, "PNG ", frames)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "v.avi"), avi)
    val dec = new FfmpegFrameDecoder(dir)
    val out = dec.decode(Media.VideoMeta(1L, "v.avi", 0.2), 25, None).toSeq
    assert(out.nonEmpty && out.forall(_.payload.length > 8))
  }
}
