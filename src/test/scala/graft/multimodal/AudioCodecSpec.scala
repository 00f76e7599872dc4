package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  test("WAV round-trip: meta and exact PCM stats") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 5, -5, 0)
    val bytes = AudioCodec.wavBytes(8000, 1, samples)
    val meta = AudioCodec.parse(bytes).get
    assert(meta.format == "wav")
    assert(meta.rate == 8000 && meta.channels == 1 && meta.bits == 16)
    assert(meta.durationMs == samples.length * 1000L / 8000)
    val stats = AudioCodec.pcm16Stats(bytes).get
    assert(stats.nSamples == samples.length)
    assert(stats.sumSquares == samples.map(s => s.toLong * s).sum)
    // signs: + + - + - + - +  (0 counts as non-negative) -> 6 changes
    assert(stats.zeroCrossings == 6)
  }

  test("stereo WAV: duration counts frames, stats count interleaved samples") {
    val samples = Array[Short](1, -1, 2, -2, 3, -3) // 3 frames x 2 channels
    val bytes = AudioCodec.wavBytes(48000, 2, samples)
    val meta = AudioCodec.parse(bytes).get
    assert(meta.channels == 2)
    assert(meta.durationMs == 3 * 1000L / 48000)
    assert(AudioCodec.pcm16Stats(bytes).get.nSamples == 6)
  }

  test("MP4 mvhd duration at both versions of the arithmetic") {
    val bytes = AudioCodec.mp4Bytes(timescale = 600, duration = 1234)
    val meta = AudioCodec.parse(bytes).get
    assert(meta.format == "mp4")
    assert(meta.rate == 600)
    assert(meta.channels == -1)
    assert(meta.durationMs == 1234 * 1000L / 600)
  }

  test("garbage, truncation, and wrong magic yield None, never throw") {
    assert(AudioCodec.parse(null).isEmpty)
    assert(AudioCodec.parse("plain text".getBytes).isEmpty)
    assert(AudioCodec.parse(Array[Byte]()).isEmpty)
    val good = AudioCodec.wavBytes(8000, 1, Array[Short](1, 2, 3))
    (1 until good.length by 7).foreach { cut =>
      AudioCodec.parse(good.take(cut)) // must not throw
    }
    // RIFF magic but chunk walk runs off the end
    val bad = "RIFFxxxxWAVEjunk".getBytes
    assert(AudioCodec.parse(bad).isEmpty)
    assert(AudioCodec.pcm16Stats(bad).isEmpty)
  }

  test("chunk/box sizes near and past 2^31 never throw (cursor must not wrap)") {
    def le(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // RIFF header + junk chunk declaring 0x7FFFFFF0 / 0x80000000 bytes:
    // walk must step past the end and yield None, not wrap negative.
    for (sz <- Seq(0x7FFFFFF0L, 0x80000000L, 0xFFFFFFFFL)) {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes); out.write(le(1000)); out.write("WAVE".getBytes)
      out.write("junk".getBytes); out.write(le(sz))
      out.write(Array[Byte](1, 2, 3, 4))
      assert(AudioCodec.parse(out.toByteArray).isEmpty)
      assert(AudioCodec.pcm16Stats(out.toByteArray).isEmpty)
    }
    // a data chunk with an absurd declared size after a valid fmt still
    // parses with the truncated actual length
    val base = AudioCodec.wavBytes(8000, 1, Array[Short](9, -9))
    val truncated = java.util.Arrays.copyOf(base, base.length)
    // data size field sits 4 bytes before the 2 samples (offset len-8-4... find "data")
    val dataAt = (0 until truncated.length - 4).find(i =>
      truncated(i) == 'd' && truncated(i + 1) == 'a' &&
        truncated(i + 2) == 't' && truncated(i + 3) == 'a').get
    System.arraycopy(le(0x7FFFFFF0L), 0, truncated, dataAt + 4, 4)
    val stats = AudioCodec.pcm16Stats(truncated)
    assert(stats.exists(_.nSamples == 2))
    // MP4 box with size >= 2^31 after ftyp: None, never throw
    def be(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    for (sz <- Seq(0x7FFFFFF0L, 0x80000000L)) {
      val out = new java.io.ByteArrayOutputStream()
      out.write(be(16)); out.write("ftyp".getBytes); out.write("isom".getBytes); out.write(be(512))
      out.write(be(sz)); out.write("junk".getBytes)
      out.write(Array[Byte](0, 0, 0, 0))
      assert(AudioCodec.parse(out.toByteArray).isEmpty)
    }
  }

  test("odd-sized chunks are word-aligned in the walk") {
    // insert a 3-byte junk chunk (padded to 4) before fmt/data
    val base = AudioCodec.wavBytes(8000, 1, Array[Short](7, -7))
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12) // RIFF header
    out.write("junk".getBytes); out.write(Array[Byte](3, 0, 0, 0)); out.write(Array[Byte](1, 2, 3, 0))
    out.write(base, 12, base.length - 12)
    val meta = AudioCodec.parse(out.toByteArray).get
    assert(meta.rate == 8000 && meta.durationMs == 2 * 1000L / 8000)
    assert(AudioCodec.pcm16Stats(out.toByteArray).get.nSamples == 2)
  }
}
