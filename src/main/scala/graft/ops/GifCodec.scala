package graft.ops

/** A REAL GIF (GIF87a/GIF89a) codec in plain Scala: logical-screen and
  * image descriptors, global/local color tables, interlacing, the
  * graphic-control extension (transparency index, delays), multi-frame
  * animations, and the variable-width LSB-first LZW entropy layer with
  * clear/end codes and the 4096-entry dictionary cap — plus an encoder
  * (single- and multi-frame, optional interlace, emitting clear codes
  * on dictionary overflow) used by the oracle gates.
  *
  * GIF is palette-based and LOSSLESS, so unlike the JPEG family every
  * conformance comparison here is EXACT. The external pin is the JDK's
  * own ImageIO GIF plugin (an independent, widely-deployed decoder
  * shipped in every JRE): GifCodecSpec decodes ImageIO-written files
  * with this codec and this codec's files with ImageIO and requires
  * byte-identical rasters in both directions.
  *
  * Frames are decoded RAW — each frame is its own sub-rectangle raster
  * with its own palette and transparency, exactly what a frame-sampling
  * training pipeline consumes; animation COMPOSITING (disposal-method
  * playback) is a presentation concern and intentionally out of scope.
  */
object GifCodec {

  /** One decoded frame: `left`/`top` place the sub-rectangle on the
    * logical screen; `pixels` are row-major ARGB-style packed RGB with
    * alpha in bits 24+ (0 for transparent pixels, 0xff otherwise). */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
      pixels: Array[Int], delayCs: Int)

  final case class Gif(width: Int, height: Int, frames: Vector[Frame])

  // ---- LZW ----

  /** Decode GIF-flavor LZW: codes start at `minCode`+1 bits, LSB-first
    * within bytes; CLEAR = 2^minCode resets the dictionary, END stops.
    * Returns the index stream. */
  private[graft] def lzwDecode(minCode: Int, data: Array[Byte],
      expected: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 11, s"bad LZW min code size $minCode")
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary as (prefix link, appended byte); entries < clear are roots
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var dictSize = end + 1
    var width = minCode + 1
    var acc = 0L; var nBits = 0; var pos = 0
    var prev = -1
    val stack = new Array[Byte](4096)

    def emit(code: Int): Byte = { // writes the expansion, returns its FIRST byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = append(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      require(outLen + sp + 1 <= expected,
        s"LZW expands past the declared raster ($expected indices)")
      out(outLen) = first; outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      first
    }

    var done = false
    while (!done) {
      while (nBits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nBits
        nBits += 8; pos += 1
      }
      require(nBits >= width, "LZW stream truncated before END code")
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nBits -= width
      if (code == clear) {
        dictSize = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"first code $code after clear must be a root")
        emit(code)
        prev = code
      } else {
        require(code <= dictSize, s"LZW code $code beyond dictionary $dictSize")
        val first =
          if (code < dictSize) emit(code)
          else { // KwKwK case: code == dictSize, expansion = prev + first(prev)
            val f = emit(prev)
            require(outLen < expected, "LZW KwKwK expands past the raster")
            out(outLen) = f; outLen += 1
            f
          }
        if (dictSize < 4096) {
          prefix(dictSize) = prev; append(dictSize) = first
          dictSize += 1
          if (dictSize < 4096 && (dictSize & (dictSize - 1)) == 0 &&
            dictSize >= (1 << width)) width += 1
        }
        prev = code
      }
    }
    require(outLen == expected,
      s"LZW produced $outLen of $expected declared indices")
    out
  }

  /** Encode indices as GIF LZW (greedy longest-match, clear code emitted
    * when the dictionary fills — the standard encoder shape). */
  private[graft] def lzwEncode(minCode: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= (code.toLong & 0xfff) << nBits
      nBits += width
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    // dictionary: map (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Int, Integer](8192)
    var dictSize = end + 1
    put(clear)
    var prev = -1
    indices.foreach { b =>
      val k = b & 0xff
      require(k < clear, s"index $k exceeds the ${clear}-entry palette")
      if (prev < 0) prev = k
      else {
        val key = (prev << 8) | k
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (dictSize < 4096) {
            dict.put(key, Integer.valueOf(dictSize))
            dictSize += 1
            // the decoder's dictionary LAGS the encoder's by one entry
            // (it adds each entry only on the following code), so where
            // the decoder widens at dictSize == 2^w, the encoder must
            // widen one entry later — at 2^w + 1 — for the flip to land
            // on the same position in the code stream
            if (dictSize > (1 << width) && width < 12) width += 1
          } else { // full: clear and restart (decoder mirrors)
            put(clear)
            dict = new java.util.HashMap[Int, Integer](8192)
            dictSize = end + 1
            width = minCode + 1
          }
          prev = k
        }
      }
    }
    if (prev >= 0) put(prev)
    put(end)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // interlace pass structure (GIF89a spec appendix E)
  private val InterlaceStarts = Array(0, 4, 2, 1)
  private val InterlaceSteps = Array(8, 8, 4, 2)

  private[graft] def deinterlaceRows(h: Int): Array[Int] = {
    val order = new Array[Int](h)
    var o = 0
    var p = 0
    while (p < 4) {
      var y = InterlaceStarts(p)
      while (y < h) { order(o) = y; o += 1; y += InterlaceSteps(p) }
      p += 1
    }
    order
  }

  // ---- decode ----

  def decode(bytes: Array[Byte]): Gif = {
    require(bytes.length >= 13, s"truncated: ${bytes.length} bytes")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"bad signature '$sig'")
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    require(sw > 0 && sh > 0, s"bad logical screen ${sw}x$sh")
    val packed = bytes(10) & 0xff
    var pos = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        require(pos + 3 * n <= bytes.length, "global color table truncated")
        val t = Array.tabulate(n)(i => 0xff000000 |
          ((bytes(pos + 3 * i) & 0xff) << 16) |
          ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff))
        pos += 3 * n
        t
      } else null

    var transparent = -1
    var delayCs = 0
    val frames = Vector.newBuilder[Frame]
    var done = false
    while (!done) {
      require(pos < bytes.length, "ran off the stream before the trailer")
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          require(pos + 1 < bytes.length, "truncated extension")
          val label = bytes(pos + 1) & 0xff
          pos += 2
          require(pos < bytes.length, "truncated extension body")
          if (label == 0xf9) { // graphic control
            require(pos + 6 <= bytes.length, "graphic control truncated")
            require((bytes(pos) & 0xff) == 4, "graphic control must be 4 bytes")
            val gcPacked = bytes(pos + 1) & 0xff
            delayCs = u16(pos + 2)
            transparent = if ((gcPacked & 1) != 0) bytes(pos + 4) & 0xff else -1
          }
          // skip this and any further sub-blocks (generic walk)
          while ({ require(pos < bytes.length, "truncated extension sub-blocks")
                   (bytes(pos) & 0xff) != 0 }) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c => // image descriptor
          require(pos + 10 <= bytes.length, "image descriptor truncated")
          val left = u16(pos + 1); val top = u16(pos + 3)
          val w = u16(pos + 5); val h = u16(pos + 7)
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          require(w > 0 && h > 0, s"bad frame dims ${w}x$h")
          require(left + w <= sw && top + h <= sh,
            s"frame ${w}x$h@$left,$top exceeds the ${sw}x$sh logical screen")
          val lct: Array[Int] =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              require(pos + 3 * n <= bytes.length, "local color table truncated")
              val t = Array.tabulate(n)(i => 0xff000000 |
                ((bytes(pos + 3 * i) & 0xff) << 16) |
                ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff))
              pos += 3 * n
              t
            } else null
          val palette = if (lct != null) lct else gct
          require(palette != null, "frame has neither local nor global color table")
          require(pos < bytes.length, "image data truncated before LZW code size")
          val minCode = bytes(pos) & 0xff
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          while ({ require(pos < bytes.length, "truncated image sub-blocks")
                   (bytes(pos) & 0xff) != 0 }) {
            val n = bytes(pos) & 0xff
            require(pos + 1 + n <= bytes.length, "image sub-block overruns the stream")
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val indices = lzwDecode(minCode, data.toByteArray, w * h)
          val rowOrder =
            if ((ip & 0x40) != 0) deinterlaceRows(h)
            else Array.tabulate(h)(identity)
          val px = new Array[Int](w * h)
          var r = 0
          while (r < h) {
            val y = rowOrder(r)
            var x = 0
            while (x < w) {
              val idx = indices(r * w + x) & 0xff
              require(idx < palette.length,
                s"index $idx outside the ${palette.length}-entry palette")
              px(y * w + x) =
                if (idx == transparent) palette(idx) & 0x00ffffff else palette(idx)
              x += 1
            }
            r += 1
          }
          frames += Frame(left, top, w, h, px, delayCs)
          transparent = -1; delayCs = 0 // graphic control covers ONE image
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at offset $pos")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "no image data before the trailer")
    Gif(sw, sh, fs)
  }

  // ---- encode ----

  /** Encode frames of palette INDICES into a GIF89a. `palette` is shared
    * (written as the global color table, padded to a power of two);
    * frames may carry offsets, per-frame delays, interlace, and a
    * transparent index. */
  def encode(screenW: Int, screenH: Int, palette: Array[Int],
      frames: Seq[(Int, Int, Int, Int, Array[Byte])], // left, top, w, h, indices
      interlace: Boolean = false, transparentIndex: Int = -1,
      delayCs: Int = 0): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, s"palette size ${palette.length}")
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    bits = math.max(bits, 2) // LZW needs minCode >= 2
    val n = 1 << bits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(screenW); w16(screenH)
    out.write(0x80 | ((bits - 1) << 4) | (bits - 1)) // GCT present
    out.write(0); out.write(0)                       // bg index, aspect
    (0 until n).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    frames.foreach { case (left, top, w, h, indices) =>
      require(indices.length == w * h, s"${indices.length} indices for ${w}x$h")
      if (transparentIndex >= 0 || delayCs > 0) {
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(if (transparentIndex >= 0) 1 else 0)
        w16(delayCs)
        out.write(math.max(transparentIndex, 0)); out.write(0)
      }
      out.write(0x2c)
      w16(left); w16(top); w16(w); w16(h)
      out.write(if (interlace) 0x40 else 0x00)
      // interlace REORDERS rows on disk: emit them in pass order
      val onDisk =
        if (!interlace) indices
        else {
          val order = deinterlaceRows(h)
          val o = new Array[Byte](indices.length)
          var r = 0
          while (r < h) {
            System.arraycopy(indices, order(r) * w, o, r * w, w)
            r += 1
          }
          o
        }
      out.write(bits)
      val lzw = lzwEncode(bits, onDisk)
      var off = 0
      while (off < lzw.length) {
        val chunk = math.min(255, lzw.length - off)
        out.write(chunk)
        out.write(lzw, off, chunk)
        off += chunk
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }
}
