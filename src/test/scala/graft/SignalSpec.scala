package graft

import graft.functions.Mfcc
import graft.sources.Wav

/** MFCC vs an independent numpy implementation of the same
  * python_speech_features formulas (goldens generated offline), and
  * the WAV codec roundtrip. */
class SignalSpec extends SparkSpec {

  test("MFCC matches the numpy golden on a 2000-sample sine") {
    val sig = Array.tabulate(2000)(i => (math.sin(i * 0.1) * 3000).toShort.toDouble)
    val cep = Mfcc.mfcc(sig)
    assert(cep.length === 11 && cep(0).length === 13)
    val golden = Map(
      0 -> Array(16.0679989701, 24.9531043184, 15.7773357583, 8.5146697631, 0.4948970347,
        -8.3826703145, -15.6174788402, -21.6588308746, -24.6926861467, -25.0390165665,
        -21.6763655479, -17.1087486017, -10.8856438550),
      5 -> Array(16.0658071303, 24.2781344644, 15.0353959351, 7.7364293424, 0.0449495285,
        -8.8386442010, -15.9199186830, -21.7856094325, -24.8151450763, -25.0979555408,
        -21.7942382454, -17.1545831692, -11.0016698860),
      10 -> Array(16.0811715792, 26.6172937632, 17.5440346590, 9.9553381193, 1.2473429001,
        -8.1380860356, -15.5300681519, -22.0381051858, -24.8929099170, -25.3490507282,
        -22.2379470564, -17.5071363107, -11.2822446018))
    for ((row, exp) <- golden; c <- 0 until 13)
      assert(math.abs(cep(row)(c) - exp(c)) < 1e-6,
        s"frame $row cep $c: ${cep(row)(c)} vs ${exp(c)}")
  }

  test("MFCC frame count follows the 100 Hz / 4-rows-per-video-frame contract") {
    // 1 second @16 kHz → 1 + ceil((16000-400)/160) = 99 frames ≈ 100 Hz
    val cep = Mfcc.mfcc(Array.fill(16000)(1000.0))
    assert(cep.length === 99)
  }

  test("fps-scaled win/step (dataLoader.py:40–46)") {
    // fps=20 → winlen 0.025*25/20 = 0.03125, winstep 0.0125
    val cep = Mfcc.mfcc(Array.fill(16000)(500.0), winLen = 0.025 * 25 / 20, winStep = 0.010 * 25 / 20)
    // frame_len 500, step 200 → 1 + ceil(15500/200) = 79
    assert(cep.length === 79)
  }

  test("WAV codec roundtrip + clip slicing") {
    val samples = Array.tabulate(16000)(i => (math.sin(i * 0.05) * 8000).toShort)
    val bytes = Wav.encode(16000, 1, samples)
    val back = Wav.decode(bytes)
    assert(back.sampleRate === 16000 && back.channels === 1)
    assert(back.samples.toSeq === samples.toSeq)
    val c = Wav.clip(back, 0.25, 0.5)
    assert(c.length === 4000)
    assert(c(0) === samples(4000))
  }

  test("WAV decode is chunk-order independent (data before fmt)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-build a legal RIFF with the data chunk FIRST, then fmt
    val samples = Array.tabulate(100)(_.toShort)
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x61746164).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
    val w = Wav.decode(bb.array())
    assert(w.sampleRate === 16000 && w.channels === 1)
    assert(w.samples.toSeq === samples.toSeq)
  }

  test("WAV decode inside a binaryFile-scan kernel") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wav").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/a.wav"),
      Wav.encode(16000, 1, Array.tabulate(800)(_.toShort)))
    val feats = spark.read.format("binaryFile").load(tmp)
      .select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) =>
        val w = Wav.decode(bytes)
        val cep = Mfcc.mfcc(w.samples.map(_.toDouble), w.sampleRate)
        (p, w.samples.length, cep.length, cep(0).length)
      }).collect()
    assert(feats.length === 1)
    // 800 samples, frame_len 400, step 160 → 1 + ceil(400/160) = 4 frames
    assert(feats(0)._2 === 800 && feats(0)._3 === 4 && feats(0)._4 === 13)
  }
}
