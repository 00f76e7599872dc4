package graft.multimodal

/** Header-level audio/video codec plus a REAL PCM decode: RIFF/WAVE
  * chunk-walk (fmt + data), ISO-BMFF (MP4) box-walk to mvhd for
  * duration, and sample-exact 16-bit PCM extraction for DSP features —
  * the genuinely computable part of an audio curation stage without
  * model weights (validity, format, rate/channels/duration for
  * filtering and bucketing; energy / zero-crossing statistics for
  * silence and noise screens).
  *
  * All parsing is bounds-checked; garbage or truncated payloads yield
  * None rather than throwing, so a 100-TB scan of crawled media
  * survives junk. The paired `wavBytes`/`mp4Bytes` encoders emit
  * spec-conformant files so tests and driver-checked queries construct
  * real binaries whose parse the oracle predicts.
  */
object AudioCodec {

  /** For WAV: rate = sample rate, channels/bits set, duration from the
    * sample count. For MP4: rate = mvhd timescale, channels/bits = -1
    * (not in the header), duration from mvhd duration/timescale.
    */
  final case class MediaMeta(format: String, rate: Int, channels: Int,
      bits: Int, durationMs: Long)

  def parse(bytes: Array[Byte]): Option[MediaMeta] =
    if (bytes == null) None
    else if (isWav(bytes)) parseWav(bytes).map(_._1)
    else if (isMp4(bytes)) parseMp4(bytes)
    else None

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def le16(b: Array[Byte], i: Int): Int = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)

  /** RIFF chunk walk: "RIFF" size "WAVE", then id/size-prefixed chunks
    * (word-aligned). Needs a "fmt " (PCM layout) and a "data" chunk;
    * duration is exact integer math — samples = dataSize / blockAlign,
    * ms = samples · 1000 / rate — so an independent replay agrees.
    * Returns the meta plus the data-chunk offset/length for the PCM
    * decode below.
    */
  private[multimodal] def parseWav(b: Array[Byte]): Option[(MediaMeta, (Int, Int))] = {
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // audioFormat, ch, rate, blockAlign, bits
    var data: Option[(Int, Int)] = None
    // Long cursor: a declared chunk size near 2^31 (or the full u32 range)
    // must not wrap the cursor negative and index out of bounds — corrupt
    // payloads yield None/truncated parses, never a task-killing throw.
    var i: Long = 12
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val ci = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      val size = le32(b, ci + 4) // unsigned u32 as Long
      val body = ci + 8
      if (b(ci) == 'f' && b(ci + 1) == 'm' && b(ci + 2) == 't' && b(ci + 3) == ' ') {
        if (body + 16 > b.length) return None
        fmt = Some((le16(b, body), le16(b, body + 2), le32(b, body + 4).toInt,
          le16(b, body + 12), le16(b, body + 14)))
      } else if (b(ci) == 'd' && b(ci + 1) == 'a' && b(ci + 2) == 't' && b(ci + 3) == 'a') {
        data = Some((body, math.min(size, (b.length - body).toLong).toInt))
      }
      i = body.toLong + size + (size & 1L) // chunks are word-aligned
    }
    for {
      (_, ch, rate, blockAlign, bits) <- fmt
      if ch > 0 && rate > 0 && blockAlign > 0
      (off, len) <- data
    } yield {
      val samples = len / blockAlign
      (MediaMeta("wav", rate, ch, bits, samples * 1000L / rate), (off, len))
    }
  }

  /** ISO-BMFF box walk: top-level size/type boxes (must start with
    * ftyp), then moov → mvhd; version 0 carries 32-bit timescale /
    * duration, version 1 64-bit duration. duration_ms =
    * duration · 1000 / timescale (integer).
    */
  private def parseMp4(b: Array[Byte]): Option[MediaMeta] = {
    def walk(from: Int, to: Int, name: String): Option[Int] = {
      // Long cursor: box sizes >= 2^31 must not wrap negative (see
      // parseWav) — advance past the end terminates the walk cleanly.
      var i: Long = from
      while (i + 8 <= to) {
        val ci = i.toInt
        val size = be32(b, ci)
        if (size < 8) return None
        if (b(ci + 4) == name(0) && b(ci + 5) == name(1) &&
            b(ci + 6) == name(2) && b(ci + 7) == name(3)) return Some(ci)
        i += size
      }
      None
    }
    for {
      moov <- walk(0, b.length, "moov")
      moovEnd = math.min(moov.toLong + be32(b, moov), b.length.toLong).toInt
      mvhd <- walk(moov + 8, moovEnd, "mvhd")
      body = mvhd + 8
      if body + 4 <= b.length
      version = b(body) & 0xff
      meta <- version match {
        case 0 if body + 20 <= b.length =>
          val ts = be32(b, body + 12); val dur = be32(b, body + 16)
          if (ts <= 0) None else Some(MediaMeta("mp4", ts.toInt, -1, -1, dur * 1000L / ts))
        case 1 if body + 32 <= b.length =>
          val ts = be32(b, body + 20); val dur = be64(b, body + 24)
          if (ts <= 0) None else Some(MediaMeta("mp4", ts.toInt, -1, -1, dur * 1000L / ts))
        case _ => None
      }
    } yield meta
  }

  /** Exact DSP statistics over a 16-bit PCM WAV: sample count, energy
    * (sum of squares — all integer, < 2^31 per sample², so the SQL
    * oracle replays it exactly), and zero crossings (adjacent sign
    * changes over the interleaved stream; sign(x) = −1 iff x < 0).
    * None for non-WAV, non-PCM, or non-16-bit payloads.
    */
  final case class PcmStats(nSamples: Long, sumSquares: Long, zeroCrossings: Long)

  def pcm16Stats(bytes: Array[Byte]): Option[PcmStats] =
    if (bytes == null || !isWav(bytes)) None
    else parseWav(bytes).collect {
      case (meta, (off, len)) if meta.bits == 16 =>
        val n = len / 2
        var sumSq = 0L
        var zc = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val s = le16(bytes, off + 2 * i).toShort.toInt
          sumSq += s.toLong * s
          val neg = s < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        PcmStats(n, sumSq, zc)
    }

  // ---- encoders (tests + oracle-checked queries) ----

  /** Complete 16-bit PCM WAV with real sample data. */
  def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write("RIFF".getBytes); w32(36L + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16)
    w16(1) // PCM
    w16(channels); w32(sampleRate)
    w32(sampleRate.toLong * channels * 2) // byte rate
    w16(channels * 2) // block align
    w16(16) // bits
    out.write("data".getBytes); w32(dataLen)
    samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }

  /** Minimal MP4: ftyp box + moov{mvhd v0} with the given timescale and
    * duration (in timescale units).
    */
  def mp4Bytes(timescale: Int, duration: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    w32(16); out.write("ftyp".getBytes); out.write("isom".getBytes); w32(512)
    val mvhdSize = 8 + 100 // full v0 mvhd body per spec
    w32(8L + mvhdSize); out.write("moov".getBytes)
    w32(mvhdSize.toLong); out.write("mvhd".getBytes)
    w32(0) // version 0 + flags
    w32(0); w32(0) // creation, modification
    w32(timescale.toLong); w32(duration)
    w32(0x00010000L) // rate 1.0
    w32(0x01000000L) // volume 1.0 + reserved
    (0 until 2).foreach(_ => w32(0)) // reserved
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w32) // unity matrix
    (0 until 6).foreach(_ => w32(0)) // pre_defined
    w32(2) // next track id
    out.toByteArray
  }
}
