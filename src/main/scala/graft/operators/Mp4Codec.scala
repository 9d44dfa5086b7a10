package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** REAL ISO BMFF (MP4/MOV) container codec in pure JVM — the second
  * container the reference's extraction stage accepts
  * (demoTalkNet.py:486–494 hands ffmpeg ANY readable container; its
  * own demo assets are .mp4). Like AviCodec, the container is fully
  * real and codec-free: the writer speaks the two intra-frame codecs
  * the JDK itself produces — `jpeg` (MJPEG-in-MP4) and `png `
  * (ffmpeg's lossless PNG-in-MOV/MP4 sample-entry tag) — inside a
  * complete, spec-shaped box tree: ftyp / mdat / moov(mvhd,
  * trak(tkhd, mdia(mdhd, hdlr, minf(vmhd, dinf, stbl(stsd, stts,
  * stsc, stsz, stco))))). Sizes are big-endian (ISO BMFF, unlike
  * RIFF), one sample per frame, one chunk per file. Framing is
  * lossless, so PNG frames roundtrip byte-exact (q279 pins that
  * under the DuckDB oracle — the q121 argument for the second
  * container family).
  *
  * The DEMUXER is deliberately more general than the muxer: it walks
  * arbitrary box order, selects the `vide` track by hdlr (skipping
  * audio/meta tracks), recovers fps from mdhd.timescale over the
  * uniform stts delta, and expands the full stsc/stco/stsz sample
  * map — so it reads not just its own files but any
  * single-video-track progressive MP4 whose samples it can decode.
  * [[decodeRangeFile]] is the object-store read pattern
  * (AviCodec.decodeRangeFile's contract): box headers are read by
  * SEEKING past mdat (never through it), moov is parsed from its own
  * bytes, and only the chunk spans covering the requested frame
  * range are ranged-read — the -ss/-to pushdown honored at the I/O
  * layer.
  */
object Mp4Codec {

  /** Parsed MP4: the video track plus, when a PCM `soun` track is
    * present (audioFourcc "sowt"/"twos"), its decoded mono samples —
    * the ffmpeg `-c:v copy -c:a copy` A/V mux surface (q129's AVI
    * shape) for the second container family. A non-PCM audio codec
    * (mp4a/esds) leaves pcm empty with its fourcc reported, the
    * honest analog of the video side's ffmpeg-seat fallthrough. */
  final case class Mp4(width: Int, height: Int, fps: Int,
      fourcc: String, frames: Vector[Array[Byte]],
      audioRate: Int = 0, pcm: Array[Short] = Array.empty,
      audioFourcc: String = "")

  private def be32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(i).array()
  private def be16(i: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(i.toShort).array()

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    require(typ.length == 4, s"box type must be 4 chars: '$typ'")
    val body = parts.map(_.length).sum
    val out = new ByteArrayOutputStream(8 + body)
    out.write(be32(8 + body))
    out.write(typ.getBytes("US-ASCII"))
    parts.foreach(out.write)
    out.toByteArray
  }

  private def fullBox(typ: String, version: Int, flags: Int,
      parts: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](version.toByte,
      ((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
      (flags & 0xff).toByte) +: parts): _*)

  /** Unity 3×3 display matrix (16.16 / 2.30 fixed) — 36 bytes. */
  private val unityMatrix: Array[Byte] = {
    val b = ByteBuffer.allocate(36).order(ByteOrder.BIG_ENDIAN)
    b.putInt(0x00010000); b.putInt(0); b.putInt(0)
    b.putInt(0); b.putInt(0x00010000); b.putInt(0)
    b.putInt(0); b.putInt(0); b.putInt(0x40000000)
    b.array()
  }

  /** Encode pre-compressed frame payloads (PNG for `png `, JPEG for
    * `jpeg`) into a complete progressive MP4: ftyp, mdat (one sample
    * per frame, one chunk), then moov with the full sample table.
    * Movie timescale is 1000 (the mvhd convention); the media
    * timescale IS the fps, so every sample's stts delta is exactly 1
    * — integer-exact fps recovery on decode, no 1001/30000 rationals
    * needed for the driver's integer-fps fixtures. `audio` adds a
    * second `soun` trak of PCM16 mono ('sowt', media timescale = the
    * sample rate) — the A/V mux surface q283 oracles. */
  def encode(width: Int, height: Int, fps: Int, fourcc: String,
      frames: Seq[Array[Byte]],
      audio: Option[(Int, Array[Short])] = None): Array[Byte] = {
    require(fourcc.length == 4, s"fourcc must be 4 chars: '$fourcc'")
    require(fps > 0, s"fps must be positive: $fps")
    val n = frames.length
    val videoDur = n * 1000 / fps
    val audioDur = audio.map { case (rate, pcm) =>
      (pcm.length.toLong * 1000 / rate).toInt }.getOrElse(0)

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isomiso2mp41".getBytes("US-ASCII"))
    // mdat sits directly after ftyp; first sample = after its header.
    // Layout: all video frames, then the one audio chunk.
    val firstSampleOffset = ftyp.length + 8
    val audioChunkOffset =
      (firstSampleOffset + frames.map(_.length.toLong).sum).toInt

    val mvhd = {
      val b = ByteBuffer.allocate(96).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0); b.putInt(0)        // creation, modification (epoch 1904: 0)
      b.putInt(1000)                  // movie timescale
      b.putInt(math.max(videoDur, audioDur)) // duration in movie ticks
      b.putInt(0x00010000)            // rate 1.0
      b.putShort(0x0100)              // volume 1.0
      b.putShort(0); b.putInt(0); b.putInt(0) // reserved
      b.put(unityMatrix)
      (0 until 6).foreach(_ => b.putInt(0))   // pre_defined
      b.putInt(if (audio.isDefined) 3 else 2) // next_track_ID
      b.array()
    }
    def tkhd(trackId: Int, durTicks: Int, volume: Int, w: Int, h: Int)
        : Array[Byte] = {
      val b = ByteBuffer.allocate(80).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0); b.putInt(0)        // creation, modification
      b.putInt(trackId)
      b.putInt(0)                     // reserved
      b.putInt(durTicks)              // duration in MOVIE ticks
      b.putInt(0); b.putInt(0)        // reserved
      b.putShort(0); b.putShort(0)    // layer, alternate_group
      b.putShort(volume.toShort); b.putShort(0) // volume, reserved
      b.put(unityMatrix)
      b.putInt(w << 16)               // 16.16 fixed
      b.putInt(h << 16)
      b.array()
    }
    def mdhd(timescale: Int, duration: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0); b.putInt(0)        // creation, modification
      b.putInt(timescale)             // video: fps; audio: sample rate
      b.putInt(duration)              // media samples
      b.putShort(0x55c4)              // language 'und'
      b.putShort(0)                   // pre_defined
      b.array()
    }
    // handler name is NUL-terminated; the terminator is an explicit
    // appended zero byte, NOT a raw 0x00 in the string literal (which
    // would make git classify this source file as binary)
    def hdlr(kind: String, name: String): Array[Byte] =
      fullBox("hdlr", 0, 0, be32(0),
        kind.getBytes("US-ASCII"), new Array[Byte](12),
        name.getBytes("US-ASCII") :+ 0.toByte)
    val dinf = box("dinf",
      fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1)))

    val sampleEntry = {
      val name = "graft"
      val compressor = new Array[Byte](32)
      compressor(0) = name.length.toByte
      name.getBytes("US-ASCII").copyToArray(compressor, 1)
      val b = ByteBuffer.allocate(78).order(ByteOrder.BIG_ENDIAN)
      b.put(new Array[Byte](6))       // reserved
      b.putShort(1)                   // data_reference_index
      b.putShort(0); b.putShort(0)    // pre_defined, reserved
      (0 until 3).foreach(_ => b.putInt(0)) // pre_defined[3]
      b.putShort(width.toShort); b.putShort(height.toShort)
      b.putInt(0x00480000); b.putInt(0x00480000) // 72 dpi
      b.putInt(0)                     // reserved
      b.putShort(1)                   // frame_count per sample
      b.put(compressor)
      b.putShort(24)                  // depth
      b.putShort(-1)                  // pre_defined
      box(fourcc, b.array())
    }
    val stsd = fullBox("stsd", 0, 0, be32(1), sampleEntry)
    val stts = fullBox("stts", 0, 0, be32(1), be32(n), be32(1))
    val stsc = fullBox("stsc", 0, 0, be32(1), be32(1), be32(math.max(n, 1)), be32(1))
    val stsz = fullBox("stsz", 0, 0, be32(0), be32(n),
      frames.toArray.flatMap(f => be32(f.length)))
    val stco = fullBox("stco", 0, 0, be32(1), be32(firstSampleOffset))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", fullBox("mdhd", 0, 0, mdhd(fps, n)),
      hdlr("vide", "GraftVideoHandler"), minf)
    val trak = box("trak",
      fullBox("tkhd", 0, 7, tkhd(1, videoDur, 0, width, height)), mdia)

    // Optional PCM16 mono audio as a SECOND trak: 'sowt' sample
    // entry (little-endian signed 16-bit — the WAV byte order), one
    // media sample per PCM sample (fixed stsz size 2, media
    // timescale = the sample rate, so stts stays the uniform delta-1
    // run), one chunk placed after the video bytes — the ffmpeg
    // `-c:v copy -c:a copy` A/V mux surface, MP4 edition of
    // AviCodec's interleaved PCM stream (q129).
    val audioTrak = audio.map { case (rate, pcm) =>
      val m = pcm.length
      val entry = {
        val b = ByteBuffer.allocate(28).order(ByteOrder.BIG_ENDIAN)
        b.put(new Array[Byte](6))     // reserved
        b.putShort(1)                 // data_reference_index
        b.putShort(0); b.putShort(0)  // version, revision
        b.putInt(0)                   // vendor
        b.putShort(1)                 // channelcount (mono)
        b.putShort(16)                // samplesize bits
        b.putShort(0); b.putShort(0)  // compression_id, packet_size
        b.putInt(rate << 16)          // samplerate 16.16
        box("sowt", b.array())
      }
      val aStbl = box("stbl",
        fullBox("stsd", 0, 0, be32(1), entry),
        fullBox("stts", 0, 0, be32(1), be32(m), be32(1)),
        fullBox("stsc", 0, 0, be32(1), be32(1), be32(math.max(m, 1)), be32(1)),
        fullBox("stsz", 0, 0, be32(2), be32(m)),
        fullBox("stco", 0, 0, be32(1), be32(audioChunkOffset)))
      val aMinf = box("minf", fullBox("smhd", 0, 0, be16(0), be16(0)),
        dinf, aStbl)
      val aMdia = box("mdia", fullBox("mdhd", 0, 0, mdhd(rate, m)),
        hdlr("soun", "GraftAudioHandler"), aMinf)
      box("trak", fullBox("tkhd", 0, 7, tkhd(2, audioDur, 0x0100, 0, 0)), aMdia)
    }
    val moov = box("moov",
      (Seq(fullBox("mvhd", 0, 0, mvhd), trak) ++ audioTrak): _*)

    val pcmBytes = audio.map { case (_, pcm) =>
      val b = ByteBuffer.allocate(pcm.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      pcm.foreach(b.putShort)
      b.array()
    }.getOrElse(Array.empty[Byte])

    val out = new ByteArrayOutputStream()
    out.write(ftyp)
    out.write(box("mdat", frames.toArray.flatten[Byte], pcmBytes))
    out.write(moov)
    out.toByteArray
  }

  // ——— demuxer ———

  /** (type, bodyStart, bodyEnd) for each box in bytes[from, until). */
  private def boxes(bytes: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = from
    while (p + 8 <= until) {
      val size = ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.BIG_ENDIAN).getInt
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      // size 1 = 64-bit largesize; size 0 = to-end-of-file
      val (bodyStart, end) =
        if (size == 1) {
          val big = ByteBuffer.wrap(bytes, p + 8, 8).order(ByteOrder.BIG_ENDIAN).getLong
          (p + 16, p + big.toInt)
        } else if (size == 0) (p + 8, until)
        else (p + 8, p + size)
      require(end > p && end <= until, s"corrupt box '$typ' at $p (size $size)")
      out += ((typ, bodyStart, end))
      p = end
    }
    out.result()
  }

  private def find(bs: Seq[(String, Int, Int)], typ: String): Option[(Int, Int)] =
    bs.collectFirst { case (t, s, e) if t == typ => (s, e) }

  private def u16(b: Array[Byte], p: Int): Int =
    ByteBuffer.wrap(b, p, 2).order(ByteOrder.BIG_ENDIAN).getShort & 0xffff
  private def u32(b: Array[Byte], p: Int): Long =
    ByteBuffer.wrap(b, p, 4).order(ByteOrder.BIG_ENDIAN).getInt & 0xffffffffL

  /** Sample table of the FIRST `vide` track in a parsed moov body:
    * (fourcc, width, height, fps, sizes, offsets). Offsets are
    * absolute file offsets from the full stsc/stco expansion, so
    * multi-chunk files demux correctly, not just this muxer's
    * one-chunk layout. */
  private def videoTable(bytes: Array[Byte], moovS: Int, moovE: Int)
      : (String, Int, Int, Int, Array[Int], Array[Long]) = {
    val traks = boxes(bytes, moovS, moovE).filter(_._1 == "trak")
    for ((_, ts, te) <- traks) {
      val mdia = find(boxes(bytes, ts, te), "mdia")
      if (mdia.isDefined) {
        val (ms, me) = mdia.get
        val mb = boxes(bytes, ms, me)
        val isVideo = find(mb, "hdlr").exists { case (hs, _) =>
          new String(bytes, hs + 8, 4, "US-ASCII") == "vide" }
        if (isVideo) {
          val (hs, _) = find(mb, "mdhd").get
          val timescale = u32(bytes, hs + 12).toInt
          val (mis, mie) = find(mb, "minf").get
          val (sts, ste) = find(boxes(bytes, mis, mie), "stbl").get
          val sb = boxes(bytes, sts, ste)
          val (sdS, _) = find(sb, "stsd").get
          // first sample entry: 4B version/flags + 4B entry_count
          val entryS = sdS + 8
          val fourcc = new String(bytes, entryS + 4, 4, "US-ASCII")
          val w = u16(bytes, entryS + 8 + 24)
          val h = u16(bytes, entryS + 8 + 26)
          val (ttS, _) = find(sb, "stts").get
          val nRuns = u32(bytes, ttS + 4).toInt
          require(nRuns == 1, s"non-uniform stts ($nRuns runs) unsupported")
          val delta = u32(bytes, ttS + 12).toInt
          require(delta > 0 && timescale % delta == 0,
            s"fps not integral: timescale $timescale / delta $delta")
          val fps = timescale / delta
          val (sizes, offsets) = sampleMap(bytes, sb)
          return (fourcc, w, h, fps, sizes, offsets)
        }
      }
    }
    throw new IllegalArgumentException("no video (hdlr 'vide') track found")
  }

  /** stsz/stsc/stco of one stbl expanded to absolute per-sample
    * (sizes, offsets) — shared by the video and audio tables. */
  private def sampleMap(bytes: Array[Byte], sb: Seq[(String, Int, Int)])
      : (Array[Int], Array[Long]) = {
    val (szS, _) = find(sb, "stsz").get
    val fixed = u32(bytes, szS + 4).toInt
    val n = u32(bytes, szS + 8).toInt
    val sizes = Array.tabulate(n)(i =>
      if (fixed != 0) fixed else u32(bytes, szS + 12 + 4 * i).toInt)
    val (scS, _) = find(sb, "stsc").get
    val nsc = u32(bytes, scS + 4).toInt
    val stscRows = Array.tabulate(nsc)(i => (
      u32(bytes, scS + 8 + 12 * i).toInt,       // first_chunk (1-based)
      u32(bytes, scS + 8 + 12 * i + 4).toInt))  // samples_per_chunk
    val (coS, _) = find(sb, "stco").get
    val nch = u32(bytes, coS + 4).toInt
    val chunkOff = Array.tabulate(nch)(i => u32(bytes, coS + 8 + 4 * i))
    // expand stsc over chunks → absolute per-sample offsets
    val offsets = new Array[Long](n)
    var sample = 0
    for (c <- 0 until nch if sample < n) {
      val perChunk = stscRows.takeWhile(_._1 <= c + 1).lastOption
        .map(_._2).getOrElse(stscRows.head._2)
      var off = chunkOff(c)
      var k = 0
      while (k < perChunk && sample < n) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1; k += 1
      }
    }
    require(sample == n, s"stsc/stco cover $sample of $n samples")
    (sizes, offsets)
  }

  /** Sample table of the FIRST `soun` track, if any: (fourcc,
    * sampleRate, sizes, offsets). None when the file has no audio
    * track — callers decide how to treat non-PCM fourccs. */
  private def soundTable(bytes: Array[Byte], moovS: Int, moovE: Int)
      : Option[(String, Int, Array[Int], Array[Long])] = {
    val traks = boxes(bytes, moovS, moovE).filter(_._1 == "trak")
    for ((_, ts, te) <- traks) {
      val mdia = find(boxes(bytes, ts, te), "mdia")
      if (mdia.isDefined) {
        val (ms, me) = mdia.get
        val mb = boxes(bytes, ms, me)
        val isAudio = find(mb, "hdlr").exists { case (hs, _) =>
          new String(bytes, hs + 8, 4, "US-ASCII") == "soun" }
        if (isAudio) {
          val (hs, _) = find(mb, "mdhd").get
          val timescale = u32(bytes, hs + 12).toInt
          val (mis, mie) = find(mb, "minf").get
          val (sts, ste) = find(boxes(bytes, mis, mie), "stbl").get
          val sb = boxes(bytes, sts, ste)
          val (sdS, _) = find(sb, "stsd").get
          val fourcc = new String(bytes, sdS + 8 + 4, 4, "US-ASCII")
          val (sizes, offsets) = sampleMap(bytes, sb)
          return Some((fourcc, timescale, sizes, offsets))
        }
      }
    }
    None
  }

  /** Parse a complete in-memory MP4 back to frames (and, for a PCM
    * `soun` track, its mono samples: 'sowt' little-endian / 'twos'
    * big-endian — any other audio codec reports its fourcc with pcm
    * left empty). */
  def decode(bytes: Array[Byte]): Mp4 = {
    val top = boxes(bytes, 0, bytes.length)
    require(find(top, "ftyp").isDefined, "not an ISO BMFF file (no ftyp)")
    val (ms, me) = find(top, "moov").getOrElse(
      throw new IllegalArgumentException("no moov box"))
    val (fourcc, w, h, fps, sizes, offsets) = videoTable(bytes, ms, me)
    val frames = sizes.indices.map(i =>
      java.util.Arrays.copyOfRange(bytes, offsets(i).toInt,
        offsets(i).toInt + sizes(i))).toVector
    soundTable(bytes, ms, me) match {
      case Some((afcc, rate, aSizes, aOffs)) =>
        val pcmCodec = afcc == "sowt" || afcc == "twos"
        val pcm = if (!pcmCodec) Array.empty[Short] else {
          val total = aSizes.map(_ / 2).sum
          val outPcm = new Array[Short](total)
          val order = if (afcc == "sowt") ByteOrder.LITTLE_ENDIAN
            else ByteOrder.BIG_ENDIAN
          var j = 0
          for (i <- aSizes.indices) {
            val b = ByteBuffer.wrap(bytes, aOffs(i).toInt, aSizes(i)).order(order)
            while (b.remaining >= 2) { outPcm(j) = b.getShort; j += 1 }
          }
          outPcm
        }
        Mp4(w, h, fps, fourcc, frames, rate, pcm, afcc)
      case None => Mp4(w, h, fps, fourcc, frames)
    }
  }

  /** Container constants without touching mdat: seek past every box
    * but moov. (What a catalog scan of a 100 TB video corpus reads:
    * ~KB per file, not the payload.) */
  def probeFile(path: java.nio.file.Path): (String, Int, Int, Int, Int) = {
    val (moov, _) = readMoov(path)
    val (fourcc, w, h, fps, sizes, _) = videoTable(moov, 8, moov.length)
    (fourcc, w, h, fps, sizes.length)
  }

  /** Positional read that LOOPS until `buf` is full: a single
    * FileChannel.read is not guaranteed to fill the buffer (short
    * reads are routine on network filesystems and large coalesced
    * spans), and a silent short read would leave zero-filled tail
    * bytes corrupting the parsed moov / frame payloads. Fails loud
    * on premature EOF instead. */
  private def readFully(ch: java.nio.channels.FileChannel,
      buf: ByteBuffer, pos: Long): Unit = {
    var p = pos
    while (buf.hasRemaining) {
      val n = ch.read(buf, p)
      require(n > 0,
        s"premature EOF at offset $p (${buf.remaining} bytes short)")
      p += n
    }
  }

  /** The moov box bytes (header included) plus its file offset,
    * found by seeking over top-level boxes — mdat is never read. */
  private def readMoov(path: java.nio.file.Path): (Array[Byte], Long) = {
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.READ)
    try {
      val len = ch.size()
      var p = 0L
      while (p + 8 <= len) {
        // a trailing 8-byte box leaves <16 header bytes in the file —
        // read what exists (the loop guard guarantees ≥8)
        val hdr = ByteBuffer.allocate(math.min(16L, len - p).toInt)
        readFully(ch, hdr, p)
        hdr.flip()
        val size = hdr.getInt & 0xffffffffL
        val typ = {
          val t = new Array[Byte](4); hdr.get(t); new String(t, "US-ASCII")
        }
        val boxLen =
          if (size == 1) { require(hdr.remaining >= 8,
            s"truncated largesize header at $p"); hdr.getLong }
          else if (size == 0) len - p
          else size
        if (typ == "moov") {
          val buf = ByteBuffer.allocate(boxLen.toInt)
          readFully(ch, buf, p)
          return (buf.array(), p)
        }
        p += boxLen
      }
      throw new IllegalArgumentException(s"no moov box in $path")
    } finally ch.close()
  }

  /** Ranged file decode honoring the -ss/-to pushdown at the I/O
    * layer (AviCodec.decodeRangeFile's contract): parse moov (mdat
    * skipped by seek), clamp [lo, hi] to the sample count, and
    * ranged-read ONLY the chunk spans covering the requested samples
    * — contiguous runs coalesce into one read each, the pattern that
    * maps 1:1 onto object-store ranged GETs. */
  def decodeRangeFile(path: java.nio.file.Path, lo: Long, hi: Long): Vector[Array[Byte]] = {
    val (moov, _) = readMoov(path)
    val (_, _, _, _, sizes, offsets) = videoTable(moov, 8, moov.length)
    val n = sizes.length
    if (n == 0 || lo >= n || hi < lo) return Vector.empty
    val l = math.max(lo, 0L).toInt
    val h = math.min(hi, (n - 1).toLong).toInt
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.READ)
    try {
      val out = Vector.newBuilder[Array[Byte]]
      var i = l
      while (i <= h) {
        // coalesce the maximal contiguous byte run starting at i
        var j = i
        while (j < h && offsets(j + 1) == offsets(j) + sizes(j)) j += 1
        val span = (offsets(j) + sizes(j) - offsets(i)).toInt
        val buf = ByteBuffer.allocate(span)
        readFully(ch, buf, offsets(i))
        val arr = buf.array()
        var p = 0
        for (k <- i to j) {
          out += java.util.Arrays.copyOfRange(arr, p, p + sizes(k))
          p += sizes(k)
        }
        i = j + 1
      }
      out.result()
    } finally ch.close()
  }
}
