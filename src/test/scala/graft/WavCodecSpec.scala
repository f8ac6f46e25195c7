package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WavCodec

/** Byte-level tests for the real RIFF/WAVE PCM codec: a hand-assembled
  * canonical file (every header byte written out longhand, independent of
  * the encoder), chunk-walking past junk chunks with odd-size padding,
  * encode→decode round-trips over randomized params, and loud rejection
  * of malformed input. */
class WavCodecSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0x5eed)

  /** 8000 Hz mono, 4 samples [0, 1000, -1000, 32767] — assembled by hand
    * so a shared encoder/decoder bug cannot self-certify. */
  private def handBuilt: Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val data = Array(0, 1000, -1000, 32767).flatMap(le16)
    ("RIFF".getBytes("ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("ASCII")
      ++ "fmt ".getBytes("ASCII") ++ le32(16)
      ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
      ++ "data".getBytes("ASCII") ++ le32(data.length) ++ data)
  }

  test("decodes a hand-assembled canonical WAV byte-for-byte") {
    val wav = WavCodec.decode(handBuilt)
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == Seq[Short](0, 1000, -1000, 32767))
    assert(wav.frames == 4)
  }

  test("walks past junk chunks (odd size => pad byte) to find data") {
    for (junk <- 1 to 5) {
      val samples = Array[Short](-2048, 2047, 7)
      val bytes = WavCodec.encode(22050, 1, samples, junk)
      val wav = WavCodec.decode(bytes)
      assert(wav.samples.toSeq == samples.toSeq, s"junk=$junk")
      // container arithmetic: 44 canonical + 8+junk+pad LIST + samples
      assert(bytes.length == 44 + 8 + junk + (junk & 1) + samples.length * 2)
    }
  }

  test("a naive offset-44 reader would misread the junk fixtures") {
    // documents that the junk chunk is load-bearing: byte 44 of a
    // junk-carrying file is inside the LIST chunk, not the data chunk
    val bytes = WavCodec.encode(8000, 1, Array[Short](12345), junk = 4)
    val at44 = ((bytes(45) & 0xff) << 8) | (bytes(44) & 0xff)
    assert(at44.toShort != 12345.toShort)
  }

  test("round-trips randomized params and samples (40 trials)") {
    (1 to 40).foreach { _ =>
      val rate = 1 + rng.nextInt(48000)
      val ch = 1 + rng.nextInt(4)
      val frames = rng.nextInt(200)
      val samples = Array.fill(frames * ch)((rng.nextInt(65536) - 32768).toShort)
      val junk = rng.nextInt(7)
      val wav = WavCodec.decode(WavCodec.encode(rate, ch, samples, junk))
      assert(wav.sampleRate == rate && wav.channels == ch && wav.frames == frames)
      assert(wav.samples.toSeq == samples.toSeq)
    }
  }

  test("rejects malformed input loudly") {
    val good = WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(good.take(10))).getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException](
      WavCodec.decode("JUNK".getBytes ++ good.drop(4))).getMessage.contains("RIFF"))
    // non-PCM: patch audioFormat (bytes 20-21) to 3 (IEEE float)
    val float = good.clone(); float(20) = 3
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(float)).getMessage.contains("PCM"))
    // 8-bit: patch bitsPerSample (bytes 34-35)
    val eight = good.clone(); eight(34) = 8
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(eight)).getMessage.contains("16-bit"))
    // data chunk with no preceding fmt: strip fmt AND fix the RIFF size
    val noFmt = good.take(12) ++ good.drop(36)   // strip the 24-byte fmt chunk
    val sz = noFmt.length - 8
    noFmt(4) = sz.toByte; noFmt(5) = (sz >> 8).toByte
    noFmt(6) = (sz >> 16).toByte; noFmt(7) = (sz >> 24).toByte
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(noFmt)).getMessage.contains("before fmt"))
  }

  test("odd trailing chunk with a truncated pad byte fails with a precise message") {
    // RIFF + fmt + an odd-size LIST chunk whose RIFF pad byte is missing
    // (and no data chunk after it) — the walk must reject it with the
    // codec's message, not ByteBuffer's bare position() exception
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmt = "fmt ".getBytes("ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val oddNoPad = "LIST".getBytes("ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3)
    val payload = "WAVE".getBytes("ASCII") ++ fmt ++ oddNoPad
    val bytes = "RIFF".getBytes("ASCII") ++ le32(payload.length) ++ payload
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(bytes)).getMessage.contains("overruns"))
  }

  test("decodeWav query emits decoder-derived features on the fixture corpus") {
    import TestSpark._
    val rows = graft.ops.Multimodal.decodeWav(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == Array(8000, 16000, 22050)((id % 3).toInt), "sample_rate")
      assert(r.getInt(3) == 1 + (id % 2).toInt, "n_channels")
      assert(r.getInt(4) == (500 + (id % 7) * 250).toInt, "n_frames")
      assert(r.getInt(6) <= 2048, "peak bound from the sample formula")
    }
  }
}
