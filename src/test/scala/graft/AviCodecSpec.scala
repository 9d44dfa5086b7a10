package graft

import graft.operators.{AviCodec, ImageCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the RIFF/AVI container: grammar (magics, sizes, even padding,
  * idx1), lossless frame framing, header recovery, and the
  * AviVideoEncoder seat's codec selection. */
class AviCodecSpec extends AnyFunSuite {

  private def le(b: Array[Byte], off: Int): Int =
    java.nio.ByteBuffer.wrap(b, off, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

  private def frames(sizes: Int*): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(k => ((k * 31 + i * 7 + 5) % 251).toByte)
    }

  test("encode → decode roundtrip: frames byte-exact, headers recovered") {
    val fs = frames(100, 33, 257) // odd sizes exercise even padding
    val avi = AviCodec.encode(320, 240, 25, "MJPG", fs)
    val back = AviCodec.decode(avi)
    assert(back.width === 320 && back.height === 240)
    assert(back.fps === 25 && back.fourcc === "MJPG")
    assert(back.frames.length === 3)
    back.frames.zip(fs).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("RIFF grammar: magics, declared sizes, idx1 entries point at 00dc") {
    val fs = frames(64, 65) // one even, one odd
    val avi = AviCodec.encode(16, 16, 25, "PNG ", fs)
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") === "AVI ")
    assert(le(avi, 4) === avi.length - 8) // RIFF size = rest of file
    // find movi list and idx1 by scan
    def find(tag: String, from: Int): Int = {
      val t = tag.getBytes("US-ASCII")
      (from until avi.length - 4).find(i => avi.slice(i, i + 4).sameElements(t)).get
    }
    val moviAt = find("movi", 12) // offset of the 'movi' fourcc
    val idxAt = find("idx1", moviAt)
    val idxBody = idxAt + 8
    val nIdx = le(avi, idxAt + 4) / 16
    assert(nIdx === 2)
    (0 until nIdx).foreach { i =>
      val e = idxBody + 16 * i
      assert(new String(avi, e, 4, "US-ASCII") === "00dc")
      assert(le(avi, e + 4) === 0x10) // AVIIF_KEYFRAME
      val off = le(avi, e + 8)   // relative to 'movi' fourcc
      val size = le(avi, e + 12)
      assert(new String(avi, moviAt + off, 4, "US-ASCII") === "00dc")
      assert(le(avi, moviAt + off + 4) === size)
      assert(size === fs(i).length)
    }
  }

  test("A/V mux: both streams roundtrip byte-exact, headers recovered") {
    val fs = frames(80, 81, 82)
    // audio longer than video: the ragged tail must survive too
    val pcm = Array.tabulate[Short](3 * 640 + 123)(j => ((j * 31) % 4001 - 2000).toShort)
    val avi = AviCodec.encode(16, 16, 25, "MJPG", fs, Some((16000, pcm)))
    val back = AviCodec.decode(avi)
    assert(back.fourcc === "MJPG" && back.frames.length === 3)
    assert(back.audioRate === 16000)
    assert(back.pcm.toSeq === pcm.toSeq)
    back.frames.zip(fs).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
    // rate must divide into whole samples per frame
    intercept[IllegalArgumentException](
      AviCodec.encode(16, 16, 25, "MJPG", fs, Some((16001, pcm))))
  }

  test("decodeRange on a muxed file: audio chunks are not frames") {
    val fs = frames(50, 51, 52, 53)
    val pcm = Array.tabulate[Short](4 * 640)(j => (j % 251).toShort)
    val avi = AviCodec.encode(16, 16, 25, "MJPG", fs, Some((16000, pcm)))
    val mid = AviCodec.decodeRange(avi, 1, 2)
    assert(mid.length === 2)
    mid.zip(fs.slice(1, 3)).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("empty stream and fps recovery") {
    val avi = AviCodec.encode(64, 48, 30, "MJPG", Seq.empty)
    val back = AviCodec.decode(avi)
    assert(back.frames.isEmpty && back.width === 64 && back.fps === 30)
    intercept[IllegalArgumentException](AviCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      AviCodec.encode(1, 1, 25, "TOOLONG", Seq.empty))
  }

  test("decodeRange: idx1 seek returns exactly [lo, hi], clamped") {
    val fs = frames(40, 41, 42, 43, 44)
    val avi = AviCodec.encode(16, 16, 25, "MJPG", fs)
    val mid = AviCodec.decodeRange(avi, 1, 3)
    assert(mid.length === 3)
    mid.zip(fs.slice(1, 4)).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq)
    }
    assert(AviCodec.decodeRange(avi, 0, 100).length === 5) // clamps to n-1
    assert(AviCodec.decodeRange(avi, 3, 2).isEmpty)        // empty range
    assert(AviCodec.decodeRange(avi, 5, 9).isEmpty)        // past the end
  }

  test("decodeRangeFile: ranged-read seek matches the in-memory decode") {
    val fs = frames(90, 91, 92, 93, 94)
    val pcm = Array.tabulate[Short](5 * 640)(j => (j % 199).toShort)
    val dir = java.nio.file.Files.createTempDirectory("graft_avi_rr")
    for ((audio, tag) <- Seq((None, "plain"), (Some((16000, pcm)), "muxed"))) {
      val avi = AviCodec.encode(16, 16, 25, "MJPG", fs, audio)
      val p = dir.resolve(s"$tag.avi")
      java.nio.file.Files.write(p, avi)
      for ((lo, hi) <- Seq((0L, 4L), (1L, 3L), (2L, 2L), (0L, 99L), (4L, 1L))) {
        val viaFile = AviCodec.decodeRangeFile(p, lo, hi)
        val viaBytes = AviCodec.decodeRange(avi, lo, hi)
        assert(viaFile.length === viaBytes.length, s"$tag [$lo,$hi]")
        viaFile.zip(viaBytes).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
      }
    }
  }

  test("real JPEG frames through MJPG: dims exact, pixels near") {
    // a SMOOTH raster (JPEG murders checkerboards at any quality)
    val rasters = (0 until 2).map(f =>
      Array.tabulate(16 * 16 * 3) { k =>
        val p = k / 3; (((p % 16) * 8 + (p / 16) * 4 + f * 16) % 200) + 20
      })
    val jpegs = rasters.map(ImageCodec.encodeJpeg(_, 16, 16, 0.95f))
    jpegs.foreach(j => assert(ImageCodec.isJpeg(j)))
    val avi = graft.sinks.MediaSinks.AviVideoEncoder
      .encode(16, 16, 25, jpegs.iterator.map(identity))
    val back = AviCodec.decode(avi)
    assert(back.fourcc === "MJPG" && back.frames.length === 2)
    back.frames.zip(rasters).foreach { case (jpeg, want) =>
      val px = ImageCodec.decodeBgrAuto(jpeg, 16, 16)
      assert(px.length === want.length)
      val maxErr = px.zip(want).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 24, s"JPEG error too large: $maxErr")
    }
  }

  test("AviVideoEncoder: PNG passthrough stays pixel-lossless") {
    val rasters = (0 until 3).map(f =>
      Array.tabulate(768)(k => (f * 37 + k * 5 + 11) % 256))
    val pngs = rasters.map(ImageCodec.encodePng(_, 16, 16))
    val avi = graft.sinks.MediaSinks.AviVideoEncoder
      .encode(16, 16, 25, pngs.iterator.map(identity))
    val back = AviCodec.decode(avi)
    assert(back.fourcc === "PNG " && back.frames.length === 3)
    back.frames.zip(rasters).foreach { case (png, want) =>
      assert(ImageCodec.decodeBgrAuto(png, 16, 16).toSeq === want.toSeq)
    }
  }

  test("AviVideoEncoder: non-image payloads wrap to decodable PNG frames") {
    val texts = Seq("CROP 1 2 3", "CROP 4 5 6").map(_.getBytes("UTF-8"))
    val avi = graft.sinks.MediaSinks.AviVideoEncoder
      .encode(8, 8, 25, texts.iterator)
    val back = AviCodec.decode(avi)
    assert(back.fourcc === "PNG ")
    back.frames.zip(texts).foreach { case (png, payload) =>
      assert(ImageCodec.isPng(png))
      val px = ImageCodec.decodeBgrAuto(png, 8, 8)
      // byte-cycle raster: pixel k = payload[k % len]
      (0 until 8 * 8 * 3).foreach { k =>
        assert(px(k) === (payload(k % payload.length) & 0xff))
      }
    }
  }
}
