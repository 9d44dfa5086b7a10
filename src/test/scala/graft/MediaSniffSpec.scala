package graft

import graft.operators.{AviCodec, ImageCodec}
import graft.sources.Media
import org.scalatest.funsuite.AnyFunSuite

/** Container-sniffing decoder dispatch (Media.AutoFrameDecoder): the
  * reference's pipeline accepts ANY container its ffmpeg can read
  * (demoTalkNet.py:486–494), so the engine picks the decoder from the
  * file's magic bytes — AVI → the pure-JVM idx1-seek decoder,
  * everything else → the ffmpeg seat — instead of a manual option. */
class MediaSniffSpec extends AnyFunSuite {

  private def tempRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("sniff")

  private def writeAvi(root: java.nio.file.Path, name: String): Seq[Array[Byte]] = {
    val frames = (0 until 3).map { f =>
      val raster = Array.tabulate(48)(k => (f * 40 + k * 5) % 256)
      ImageCodec.encodePng(raster, 4, 4)
    }
    val avi = AviCodec.encode(4, 4, 25, "PNG ", frames)
    java.nio.file.Files.write(root.resolve(name), avi)
    frames
  }

  test("sniffContainer recognizes the container magics") {
    val root = tempRoot()
    writeAvi(root, "a.avi")
    assert(Media.sniffContainer(root.resolve("a.avi")) == "avi")
    val mp4 = Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm')
    java.nio.file.Files.write(root.resolve("b.mp4"), mp4)
    assert(Media.sniffContainer(root.resolve("b.mp4")) == "mp4")
    java.nio.file.Files.write(root.resolve("c.mkv"),
      Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 1, 2, 3, 4))
    assert(Media.sniffContainer(root.resolve("c.mkv")) == "mkv")
    java.nio.file.Files.write(root.resolve("d.ts"),
      Array[Byte](0x47, 0x40, 0x11, 0x10, 0, 0, 0, 0))
    assert(Media.sniffContainer(root.resolve("d.ts")) == "mpegts")
    java.nio.file.Files.write(root.resolve("e.bin"), Array[Byte](9, 9, 9, 9))
    assert(Media.sniffContainer(root.resolve("e.bin")) == "unknown")
  }

  test("auto: AVI magic dispatches to the pure-JVM idx1-seek decoder") {
    val root = tempRoot()
    val frames = writeAvi(root, "v.avi")
    val meta = Media.VideoMeta(1L, "v.avi", 3.0 / 25)
    val auto = Media.resolveDecoder(s"auto:$root").decode(meta, 25, None).toSeq
    val direct = new Media.AviFileFrameDecoder(root.toString).decode(meta, 25, None).toSeq
    assert(auto.map(_.checksum) == direct.map(_.checksum))
    assert(auto.map(_.payload.toSeq) == frames.map(_.toSeq))
    // the range pushdown flows through the dispatch unchanged
    val ranged = Media.resolveDecoder(s"auto:$root")
      .decode(meta, 25, Some(Media.DecodeRange(1, 1))).toSeq
    assert(ranged.map(_.frame) == Seq(1L) &&
      ranged.head.payload.toSeq == frames(1).toSeq)
  }

  test("auto: unknown magic dispatches to the ffmpeg seat") {
    val have = try {
      new ProcessBuilder("ffmpeg", "-version").start().waitFor() == 0
    } catch { case _: java.io.IOException => false }
    assume(!have, "ffmpeg present: the dispatch would shell out for real")
    val root = tempRoot()
    // EBML magic (mkv): no pure-JVM demuxer exists for it, so the
    // dispatch must pick the ffmpeg seat (mp4 now routes to the
    // pure-JVM Mp4FileFrameDecoder first — Mp4CodecSpec covers it)
    java.nio.file.Files.write(root.resolve("v.mkv"),
      Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 1, 2, 3, 4))
    val meta = Media.VideoMeta(2L, "v.mkv", 1.0)
    // with no binary, choosing the ffmpeg branch is observable by its
    // availability error — an AVI-branch bug would fail differently
    val e = intercept[IllegalStateException] {
      Media.resolveDecoder(s"auto:$root").decode(meta, 25, None).toSeq
    }
    assert(e.getMessage.contains("ffmpeg binary"))
  }

  test("auto: mp4 with a non-JVM codec falls through to the ffmpeg seat") {
    val have = try {
      new ProcessBuilder("ffmpeg", "-version").start().waitFor() == 0
    } catch { case _: java.io.IOException => false }
    assume(!have, "ffmpeg present: the dispatch would shell out for real")
    val root = tempRoot()
    // a REAL box tree whose stsd sample entry says avc1 (h264): the
    // pure-JVM demuxer must recognize it cannot decode the samples
    // and hand the file to the ffmpeg seat by PARSED fourcc
    java.nio.file.Files.write(root.resolve("h.mp4"),
      graft.operators.Mp4Codec.encode(4, 4, 25, "avc1",
        Seq(Array[Byte](1, 2, 3))))
    val meta = Media.VideoMeta(3L, "h.mp4", 1.0)
    val e = intercept[IllegalStateException] {
      Media.resolveDecoder(s"auto:$root").decode(meta, 25, None).toSeq
    }
    assert(e.getMessage.contains("ffmpeg binary"))
  }
}
