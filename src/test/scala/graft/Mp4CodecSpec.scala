package graft

import graft.operators.{ImageCodec, Mp4Codec}
import graft.sources.Media

/** The ISO BMFF codec under test: byte-exact roundtrip, the
  * moov-seek + ranged-sample file reads (the -ss/-to pushdown at the
  * I/O layer), the container sniff, and the auto-decoder dispatch to
  * the pure-JVM MP4 path. */
class Mp4CodecSpec extends SparkSpec {

  private def pngFrames(seed: Long, n: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      val raster = Array.tabulate(768)(k => ((seed * 31 + f * 7 + k * 5) % 256).toInt)
      ImageCodec.encodePng(raster, 16, 16)
    }

  test("mp4 encode/decode roundtrips frames byte-exact") {
    val frames = pngFrames(7, 5)
    val mp4 = Mp4Codec.encode(16, 16, 25, "png ", frames)
    val back = Mp4Codec.decode(mp4)
    assert(back.width == 16 && back.height == 16 && back.fps == 25)
    assert(back.fourcc == "png ")
    assert(back.frames.length == 5)
    for (i <- frames.indices)
      assert(java.util.Arrays.equals(back.frames(i), frames(i).toArray),
        s"frame $i differs")
  }

  test("a/v mux roundtrips both streams; video-only files stay audio-free") {
    val frames = pngFrames(5, 4)
    val pcm = Array.tabulate[Short](2560)(j => (((j * 37) % 4001) - 2000).toShort)
    val mp4 = Mp4Codec.encode(16, 16, 25, "png ", frames, Some((16000, pcm)))
    val back = Mp4Codec.decode(mp4)
    assert(back.fourcc == "png " && back.frames.length == 4)
    for (i <- frames.indices)
      assert(java.util.Arrays.equals(back.frames(i), frames(i).toArray))
    assert(back.audioFourcc == "sowt")
    assert(back.audioRate == 16000)
    assert(back.pcm.toSeq == pcm.toSeq, "PCM samples must roundtrip exactly")
    // the video sample map must be unaffected by the second trak:
    // ranged file reads still address the right video bytes
    val f = java.nio.file.Files.createTempFile("graft_mp4av", ".mp4")
    java.nio.file.Files.write(f, mp4)
    try {
      val mid = Mp4Codec.decodeRangeFile(f, 1, 2)
      assert(mid.length == 2)
      for ((got, i) <- mid.zipWithIndex)
        assert(java.util.Arrays.equals(got, frames(1 + i).toArray))
    } finally java.nio.file.Files.delete(f)
    // no audio trak → empty audio surface, not a parse failure
    val plain = Mp4Codec.decode(Mp4Codec.encode(16, 16, 25, "png ", frames))
    assert(plain.audioFourcc == "" && plain.pcm.isEmpty && plain.audioRate == 0)
  }

  test("ranged file decode returns exactly the requested span, moov found by seek") {
    val frames = pngFrames(11, 8)
    val mp4 = Mp4Codec.encode(16, 16, 25, "jpeg", frames)
    val f = java.nio.file.Files.createTempFile("graft_mp4", ".mp4")
    java.nio.file.Files.write(f, mp4)
    try {
      val (fourcc, w, h, fps, n) = Mp4Codec.probeFile(f)
      assert((fourcc, w, h, fps, n) == (("jpeg", 16, 16, 25, 8)))
      val mid = Mp4Codec.decodeRangeFile(f, 2, 5)
      assert(mid.length == 4)
      for ((got, i) <- mid.zipWithIndex)
        assert(java.util.Arrays.equals(got, frames(2 + i).toArray))
      // clamping: past-the-end and inverted ranges behave like AviCodec
      assert(Mp4Codec.decodeRangeFile(f, 6, 100).length == 2)
      assert(Mp4Codec.decodeRangeFile(f, 9, 10).isEmpty)
    } finally java.nio.file.Files.delete(f)
  }

  test("sniff identifies the written file and auto decoder takes the pure-JVM path") {
    val frames = pngFrames(3, 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_mp4_root")
    val f = dir.resolve("v3.mp4")
    java.nio.file.Files.write(f, Mp4Codec.encode(16, 16, 25, "png ", frames))
    try {
      assert(Media.sniffContainer(f) == "mp4")
      val dec = Media.resolveDecoder(s"auto:$dir")
      val got = dec.decode(Media.VideoMeta(3L, "v3", 4.0 / 25), 25,
        Some(Media.DecodeRange(1, 2))).toVector
      assert(got.map(_.frame) == Vector(1L, 2L))
      for ((fr, i) <- got.zipWithIndex) {
        assert(java.util.Arrays.equals(fr.payload, frames(1 + i).toArray))
        assert(fr.checksum == Media.payloadChecksum(fr.payload))
      }
    } finally {
      java.nio.file.Files.delete(f); java.nio.file.Files.delete(dir)
    }
  }
}
