package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** REAL RIFF/AVI container codec in pure JVM — the video-container
  * half of the cv2.VideoWriter seat (demoTalkNet.py:184–206, 356–366)
  * made real. The reference writes XVID; a codec-free container can't
  * do inter-frame compression, so this writer speaks the two
  * intra-frame codecs whose payloads the JDK itself produces:
  * `MJPG` (JPEG frames — cv2's classic fallback) and `PNG `
  * (ffmpeg's lossless PNG-in-AVI tag). The CONTAINER is fully real:
  * RIFF/hdrl(avih, strl(strh, strf))/movi/idx1 with little-endian
  * sizes, even-padded chunks, and an AVIIF_KEYFRAME idx1 entry per
  * frame — players and ffprobe read the output. Framing is lossless,
  * so PNG frames roundtrip byte-exact (what q121 pins under the
  * DuckDB oracle, the q114 argument one container level up). A
  * second interleaved `auds` PCM stream makes the A/V mux real
  * (q129) — the ffmpeg `-c copy` contract of demoTalkNet.py:207–213.
  */
object AviCodec {

  final case class Avi(width: Int, height: Int, fps: Int,
      fourcc: String, frames: Vector[Array[Byte]],
      audioRate: Int = 0, pcm: Array[Short] = Array.empty)

  private def le(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(id.getBytes("US-ASCII"))
    out.write(le(body.length))
    out.write(body)
    if (body.length % 2 == 1) out.write(0) // RIFF chunks pad to even
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("LIST".getBytes("US-ASCII"))
    out.write(le(body.length + 4))
    out.write(kind.getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  /** Encode pre-compressed frame payloads (JPEG for `MJPG`, PNG for
    * `PNG `) into a complete single-stream AVI. */
  def encode(width: Int, height: Int, fps: Int, fourcc: String,
      frames: Seq[Array[Byte]]): Array[Byte] =
    encode(width, height, fps, fourcc, frames, None)

  /** Full A/V MUX (the ffmpeg `-c:v copy -c:a copy` of
    * demoTalkNet.py:207–213 / extractSpeakingSegments.py:83–87, for
    * real): a second `auds` stream of 16-bit mono PCM, interleaved as
    * one `01wb` chunk (rate/fps samples) after each `00dc` frame —
    * the layout players expect for progressive read. Both streams are
    * indexed in idx1; framing stays lossless, so frames AND samples
    * roundtrip byte-exact (q129 pins that under the oracle). */
  def encode(width: Int, height: Int, fps: Int, fourcc: String,
      frames: Seq[Array[Byte]], audio: Option[(Int, Array[Short])]): Array[Byte] = {
    require(fourcc.length == 4, s"fourcc must be 4 chars: '$fourcc'")
    require(fps > 0, s"fps must be positive: $fps")
    val n = frames.length
    val maxBuf = if (n == 0) 0 else frames.map(_.length).max

    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps) // dwMicroSecPerFrame
      b.putInt(maxBuf * fps)  // dwMaxBytesPerSec
      b.putInt(0)             // dwPaddingGranularity
      b.putInt(0x10)          // dwFlags = AVIF_HASINDEX
      b.putInt(n)             // dwTotalFrames
      b.putInt(0)             // dwInitialFrames
      b.putInt(if (audio.isDefined) 2 else 1) // dwStreams
      b.putInt(maxBuf)        // dwSuggestedBufferSize
      b.putInt(width)
      b.putInt(height)
      // dwReserved[4] stays zero
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII"))
      b.put(fourcc.getBytes("US-ASCII"))
      b.putInt(0); b.putShort(0); b.putShort(0) // flags, priority, language
      b.putInt(0)   // dwInitialFrames
      b.putInt(1)   // dwScale
      b.putInt(fps) // dwRate → fps = rate/scale
      b.putInt(0)   // dwStart
      b.putInt(n)   // dwLength (frames)
      b.putInt(maxBuf) // dwSuggestedBufferSize
      b.putInt(-1)  // dwQuality (default)
      b.putInt(0)   // dwSampleSize (0 = variable)
      b.putShort(0); b.putShort(0)
      b.putShort(width.toShort); b.putShort(height.toShort) // rcFrame
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40)
      b.putInt(width)
      b.putInt(height)
      b.putShort(1)  // biPlanes
      b.putShort(24) // biBitCount
      b.put(fourcc.getBytes("US-ASCII")) // biCompression
      b.putInt(width * height * 3) // biSizeImage (nominal)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      b.array()
    }
    val audioStrl = audio.map { case (rate, pcm) =>
      require(rate > 0 && rate % fps == 0,
        s"audio rate $rate must be a positive multiple of fps $fps")
      val ash = { // strh for the auds stream
        val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
        b.put("auds".getBytes("US-ASCII"))
        b.putInt(0) // fccHandler (0 = PCM)
        b.putInt(0); b.putShort(0); b.putShort(0)
        b.putInt(0)        // dwInitialFrames
        b.putInt(1)        // dwScale
        b.putInt(rate)     // dwRate → samples/sec
        b.putInt(0)        // dwStart
        b.putInt(pcm.length) // dwLength (samples)
        b.putInt(rate * 2) // dwSuggestedBufferSize
        b.putInt(-1)       // dwQuality
        b.putInt(2)        // dwSampleSize (bytes per mono 16-bit sample)
        b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0)
        b.array()
      }
      val asf = { // strf = PCMWAVEFORMAT
        val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(1)          // wFormatTag = PCM
        b.putShort(1)          // nChannels
        b.putInt(rate)         // nSamplesPerSec
        b.putInt(rate * 2)     // nAvgBytesPerSec
        b.putShort(2)          // nBlockAlign
        b.putShort(16)         // wBitsPerSample
        b.array()
      }
      list("strl", chunk("strh", ash) ++ chunk("strf", asf))
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)) ++
        audioStrl.getOrElse(Array.emptyByteArray))

    // movi body + idx1 offsets (relative to the 'movi' fourcc; the
    // first chunk header starts at offset 4). With audio: one 01wb
    // chunk of rate/fps samples interleaved after each frame, the
    // remainder (ragged tail, or audio longer than video) appended
    // as a final chunk.
    val moviBody = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream()
    def put(id: String, body: Array[Byte]): Unit = {
      val off = 4 + moviBody.size()
      moviBody.write(chunk(id, body))
      idx.write(id.getBytes("US-ASCII"))
      idx.write(le(0x10)) // AVIIF_KEYFRAME (intra/PCM: every chunk)
      idx.write(le(off))
      idx.write(le(body.length))
    }
    def pcmBytes(pcm: Array[Short], from: Int, until: Int): Array[Byte] = {
      val b = ByteBuffer.allocate((until - from) * 2).order(ByteOrder.LITTLE_ENDIAN)
      var i = from
      while (i < until) { b.putShort(pcm(i)); i += 1 }
      b.array()
    }
    audio match {
      case None => frames.foreach(put("00dc", _))
      case Some((rate, pcm)) =>
        val spf = rate / fps
        var a = 0
        frames.foreach { f =>
          put("00dc", f)
          val hi = math.min(a + spf, pcm.length)
          if (hi > a) { put("01wb", pcmBytes(pcm, a, hi)); a = hi }
        }
        if (a < pcm.length) put("01wb", pcmBytes(pcm, a, pcm.length))
    }
    val movi = list("movi", moviBody.toByteArray)

    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    riffBody.write(hdrl)
    riffBody.write(movi)
    riffBody.write(chunk("idx1", idx.toByteArray))
    val body = riffBody.toByteArray

    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le(body.length))
    out.write(body)
    out.toByteArray
  }

  /** Range decode via the idx1 index — the in-container analog of
    * ffmpeg `-ss/-to` seeking (demoTalkNet.py:491–493): locate `movi`
    * and `idx1` by walking TOP-LEVEL chunks only, then jump straight
    * to the byte offsets of frames [lo, hi] (inclusive, clamped).
    * Frames outside the range are never touched, let alone copied —
    * the contract the FrameSource pushdown requires. On a remote
    * store the same walk turns into three ranged reads (header, idx1,
    * frame span) instead of a whole-file fetch. */
  def decodeRange(avi: Array[Byte], lo: Long, hi: Long): Vector[Array[Byte]] = {
    require(avi.length >= 12 && fourccAt(avi, 0) == "RIFF" &&
      fourccAt(avi, 8) == "AVI ", "not a RIFF/AVI payload")
    var moviAt = -1; var idxAt = -1; var idxLen = 0
    var p = 12
    val end = 8 + leAt(avi, 4)
    while (p + 8 <= end && (moviAt < 0 || idxAt < 0)) {
      val id = fourccAt(avi, p)
      val sz = leAt(avi, p + 4)
      if (id == "LIST" && fourccAt(avi, p + 8) == "movi") moviAt = p + 8
      else if (id == "idx1") { idxAt = p + 8; idxLen = sz }
      p = p + 8 + sz + (sz % 2)
    }
    require(moviAt >= 0, "AVI has no movi list")
    require(idxAt >= 0, "AVI has no idx1 index (seek needs one)")
    // frame index = position among the 00dc entries only (a muxed
    // file interleaves 01wb audio entries between them)
    val videoEntries = (0 until idxLen / 16).iterator
      .map(i => idxAt + 16 * i)
      .filter(e => fourccAt(avi, e) == "00dc")
      .toVector
    val from = math.max(lo, 0L).toInt
    val to = math.min(hi, videoEntries.length - 1L).toInt
    (from to to).iterator.map { i =>
      val e = videoEntries(i)
      val off = leAt(avi, e + 8)
      val size = leAt(avi, e + 12)
      java.util.Arrays.copyOfRange(avi, moviAt + off + 8, moviAt + off + 8 + size)
    }.toVector
  }

  /** [[decodeRange]] against a FILE with genuinely ranged reads: walk
    * the top-level chunk headers by seek (8 bytes each), read idx1,
    * then one contiguous read spanning exactly the requested frames'
    * chunks — the access pattern that maps 1:1 onto object-store
    * ranged GETs. Never reads the movi payload outside [lo, hi]. */
  def decodeRangeFile(path: java.nio.file.Path, lo: Long, hi: Long): Vector[Array[Byte]] = {
    val raf = new java.io.RandomAccessFile(path.toFile, "r")
    try {
      def readAt(off: Long, n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        raf.seek(off); raf.readFully(b); b
      }
      val head = readAt(0, 12)
      require(fourccAt(head, 0) == "RIFF" && fourccAt(head, 8) == "AVI ",
        "not a RIFF/AVI file")
      val end = 8L + leAt(head, 4)
      var moviAt = -1L; var idx: Array[Byte] = null
      var p = 12L
      while (p + 8 <= end && (moviAt < 0 || idx == null)) {
        val hdr = readAt(p, 8)
        val id = fourccAt(hdr, 0)
        val sz = leAt(hdr, 4)
        if (id == "LIST" && fourccAt(readAt(p + 8, 4), 0) == "movi") moviAt = p + 8
        else if (id == "idx1") idx = readAt(p + 8, sz)
        p = p + 8 + sz + (sz % 2)
      }
      require(moviAt >= 0, "AVI has no movi list")
      require(idx != null, "AVI has no idx1 index (seek needs one)")
      val entries = (0 until idx.length / 16).map(i => i * 16)
        .filter(e => fourccAt(idx, e) == "00dc")
      val from = math.max(lo, 0L).toInt
      val to = math.min(hi, entries.length - 1L).toInt
      if (from > to) return Vector.empty
      // ONE contiguous read covering the span (frames are written in
      // index order; interleaved audio inside the span rides along —
      // still a single ranged read, not per-frame seeks)
      // idx1 offsets/sizes are UNSIGNED 32-bit in RIFF (files up to
      // ~4 GB): widen before arithmetic so a >2 GiB offset stays valid
      def leAtU(b: Array[Byte], off: Int): Long = leAt(b, off) & 0xffffffffL
      val firstOff = moviAt + leAtU(idx, entries(from) + 8)
      val lastE = entries(to)
      val endOff = moviAt + leAtU(idx, lastE + 8) + 8L + leAtU(idx, lastE + 12)
      // RIFF permits ~4 GB files but a single JVM array tops out at
      // Int.MaxValue — fail loudly instead of truncating the length
      require(endOff - firstOff <= Int.MaxValue,
        s"AVI frame span [$from,$to] covers ${endOff - firstOff} bytes " +
          "(> 2 GiB): narrow the requested frame range")
      val span = readAt(firstOff, (endOff - firstOff).toInt)
      (from to to).iterator.map { i =>
        val e = entries(i)
        val off = (moviAt + leAtU(idx, e + 8) - firstOff).toInt
        val size = leAtU(idx, e + 12).toInt
        java.util.Arrays.copyOfRange(span, off + 8, off + 8 + size)
      }.toVector
    } finally raf.close()
  }

  private def fourccAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def leAt(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  /** Parse an AVI produced by [[encode]] (or any single-video-stream
    * writer using the same chunk ids): recovers dimensions, fps,
    * fourcc and the exact `00dc` frame payloads. Walks the chunk
    * graph by declared sizes — no offsets are assumed beyond the RIFF
    * grammar itself. */
  def decode(avi: Array[Byte]): Avi = {
    require(avi.length >= 12 && fourccAt(avi, 0) == "RIFF" &&
      fourccAt(avi, 8) == "AVI ", "not a RIFF/AVI payload")
    var width = 0; var height = 0; var fps = 0; var fourcc = "????"
    var audioRate = 0
    val frames = Vector.newBuilder[Array[Byte]]
    val audioBytes = new ByteArrayOutputStream()

    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fourccAt(avi, p)
        val sz = leAt(avi, p + 4)
        val body = p + 8
        id match {
          case "LIST" =>
            val kind = fourccAt(avi, body)
            // descend into hdrl/strl/movi; kind occupies body[0,4)
            if (kind == "hdrl" || kind == "strl" || kind == "movi")
              walk(body + 4, body + sz)
          case "avih" =>
            width = leAt(avi, body + 32)
            height = leAt(avi, body + 36)
          case "strh" if fourccAt(avi, body) == "vids" =>
            fourcc = fourccAt(avi, body + 4)
            val scale = leAt(avi, body + 20)
            val rate = leAt(avi, body + 24)
            if (scale > 0) fps = rate / scale
          case "strh" if fourccAt(avi, body) == "auds" =>
            val scale = leAt(avi, body + 20)
            val rate = leAt(avi, body + 24)
            if (scale > 0) audioRate = rate / scale
          case "00dc" =>
            frames += java.util.Arrays.copyOfRange(avi, body, body + sz)
          case "01wb" =>
            audioBytes.write(avi, body, sz)
          case _ => // strf, idx1, JUNK: skip
        }
        p = body + sz + (sz % 2) // chunks are even-padded
      }
    }
    walk(12, 8 + leAt(avi, 4))
    val ab = audioBytes.toByteArray
    val pcm = new Array[Short](ab.length / 2)
    val bb = ByteBuffer.wrap(ab).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < pcm.length) { pcm(i) = bb.getShort(); i += 1 }
    Avi(width, height, fps, fourcc, frames.result(), audioRate, pcm)
  }
}
