package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL (not stubbed) RIFF/WAVE PCM codec in plain Scala — no external
  * libraries, pure byte math, which is exactly why WAV was chosen as the
  * format to de-stub the multimodal pillar with: 16-bit PCM WAV is an
  * uncompressed public format (RIFF container, little-endian fields)
  * whose decode is fully specified by the Microsoft/IBM RIFF spec.
  *
  * The reference treats media as opaque blobs (it has no media path at
  * all); this codec is the "beyond-the-reference" decode step that
  * [[Multimodal]]'s batch plumbing was built to host. The encoder is used
  * by the fixture generator (deterministic per-row WAVs synthesized
  * inside the Spark job) and the decoder is the production-shaped parse:
  * it validates magic, WALKS the chunk list (it does not assume the data
  * chunk sits at byte 44 — real-world WAVs carry LIST/INFO/fact chunks
  * before it), honors the RIFF odd-size pad byte, and rejects
  * non-PCM/non-16-bit content loudly.
  *
  * Scale shape: encode/decode are per-row, CPU-only, zero-shuffle — they
  * run inside `mapPartitions` exactly where a libsndfile/ffmpeg call
  * would sit, so the 100 TB argument is [[Multimodal]]'s: narrow
  * dependency, partition = batch, only small feature rows ever shuffle.
  */
object WavCodec {

  /** Decoded PCM stream: format metadata straight from the fmt chunk plus
    * the interleaved samples from the data chunk. `samples.length` =
    * frames × channels. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }

  /** Encode interleaved 16-bit PCM frames as a spec-complete WAV blob.
    * `junk` injects an artificial LIST chunk of that many payload bytes
    * BEFORE the data chunk (odd sizes get the RIFF pad byte), so decoders
    * tested against these fixtures must genuinely chunk-walk. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
      junk: Int = 0): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"interleave mismatch: ${samples.length} samples, $channels channels")
    val dataSize = samples.length * 2
    val junkChunk = if (junk > 0) 8 + junk + (junk & 1) else 0
    val riffSize = 4 + (8 + 16) + junkChunk + (8 + dataSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("ASCII"))
    // fmt chunk: PCM (audioFormat=1), 16-bit
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)        // byte rate
      .putShort((channels * 2).toShort)          // block align
      .putShort(16)
    if (junk > 0) {
      buf.put("LIST".getBytes("ASCII")).putInt(junk)
      var i = 0
      while (i < junk) { buf.put((i * 7 + 1).toByte); i += 1 }
      if ((junk & 1) == 1) buf.put(0.toByte)     // RIFF pad byte
    }
    buf.put("data".getBytes("ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a WAV blob. Throws IllegalArgumentException with a precise
    * message on malformed input — a 100 TB media crawl WILL contain
    * garbage, and silent misparses poison downstream features. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, s"truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "ASCII")
    }
    require(fourcc() == "RIFF", "missing RIFF magic")
    val riffSize = buf.getInt
    require(riffSize >= 4 && riffSize <= bytes.length - 8,
      s"RIFF size $riffSize exceeds payload ${bytes.length}")
    require(fourcc() == "WAVE", "missing WAVE form type")
    var rate = -1; var ch = -1; var bits = -1
    var samples: Array[Short] = null
    // Chunk walk: fmt must precede data per spec; unknown chunks are
    // skipped with their pad byte. Stop once data is in hand.
    while (samples == null && buf.remaining() >= 8) {
      val id = fourcc()
      val size = buf.getInt
      // the pad byte is included in the bound: a trailing odd-size chunk
      // whose pad byte is truncated must fail with THIS message, not
      // ByteBuffer's bare IllegalArgumentException from position() (the
      // pad is part of the container per RIFF, even after the last chunk)
      require(size >= 0 && size + (size & 1) <= buf.remaining(),
        s"chunk '$id' size $size (+pad) overruns remaining ${buf.remaining()}")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmtEnd = buf.position() + size + (size & 1)
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM: audioFormat=$audioFormat")
          ch = buf.getShort & 0xffff
          rate = buf.getInt
          buf.getInt                              // byte rate (derived)
          buf.getShort                            // block align (derived)
          bits = buf.getShort & 0xffff
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          require(ch > 0, "zero channels")
          buf.position(fmtEnd)                    // skip any fmt extension
        case "data" =>
          require(rate > 0, "data chunk before fmt chunk")
          require(size % (2 * ch) == 0,
            s"data size $size not a multiple of frame size ${2 * ch}")
          val out = new Array[Short](size / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk found")
    Wav(rate, ch, bits, samples)
  }
}
