package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE PCM codec — the reference's wavfile.read/write
  * surface (demoTalkNet.py:210, 237; utils/tools.py:134–139): 16-bit
  * PCM mono in, clip slicing by sample index, and writing clip files.
  * Used inside binaryFile-scan kernels: `spark.read.format
  * ("binaryFile")` rows feed `decode`, clip slices feed `encode`.
  */
object Wav {

  final case class WavData(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Parse a PCM16 RIFF/WAVE byte array (chunk-walking, as scipy). */
  def decode(bytes: Array[Byte]): WavData = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == 0x46464952, "not RIFF") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "not WAVE") // "WAVE"
    // Walk ALL chunks first (RIFF allows data before fmt), then
    // validate bits and decode — chunk order must not matter.
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataPos = -1; var dataSize = 0
    while (pos + 8 <= bytes.length) {
      val id = bb.getInt(pos)
      val size = bb.getInt(pos + 4)
      if (id == 0x20746d66) { // "fmt "
        channels = bb.getShort(pos + 10)
        sampleRate = bb.getInt(pos + 12)
        bits = bb.getShort(pos + 22)
      } else if (id == 0x61746164) { // "data"
        dataPos = pos + 8; dataSize = size
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(dataPos >= 0, "no data chunk")
    require(bits == 16, s"only PCM16 supported, got $bits-bit")
    val n = dataSize / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = bb.getShort(dataPos + 2 * i); i += 1 }
    WavData(sampleRate, channels, samples)
  }

  /** Encode PCM16 mono/interleaved samples as a RIFF/WAVE byte array. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.putInt(0x61746164).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Sample-index clip slice: [startS·rate, endS·rate) — the
    * reference's audio clip extraction (utils/tools.py:136–139). */
  def clip(w: WavData, startS: Double, endS: Double): Array[Short] = {
    val a = math.max(0, (startS * w.sampleRate).toInt)
    val b = math.min(w.samples.length, (endS * w.sampleRate).toInt)
    java.util.Arrays.copyOfRange(w.samples, a, b)
  }
}
