package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PngCodec

/** Tests for the JDK-only PNG codec. The unfilter math is verified
  * against HAND-COMPUTED expectations (worked from the PNG spec §9, not
  * from the encoder) so a mirrored encode/decode bug cannot
  * self-certify through round-trips alone; round-trips then cover every
  * filter mode, chunk CRCs, split IDAT, and loud rejection. */
class PngCodecSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0x9196)

  test("unfilter reproduces hand-computed Sub and Paeth rows (spec §9)") {
    // 2x2 RGB (bpp=3, stride=6 bytes): row 0 filter 1 (Sub), row 1 filter 4
    // (Paeth); expected values worked by hand from the spec definitions
    val raw = Array[Int](
      1, 10, 20, 30, 250, 5, 10,
      4, 1, 2, 3, 4, 5, 6).map(_.toByte)
    val px = PngCodec.unfilter(raw, 6, 2, 3)
    assert(px.toSeq == Seq(
      10, 20, 30, 4, 25, 40,      // Sub: 250+10 ≡ 4 (mod 256)
      11, 22, 33, 8, 30, 46))     // Paeth picks `above` at x<3, then by min
  }

  test("unfilter reproduces a hand-computed Average row") {
    val raw = Array[Int](3, 100, 7, 8, 200, 9, 10).map(_.toByte)
    val px = PngCodec.unfilter(raw, 6, 1, 3)
    assert(px.toSeq == Seq(100, 7, 8, 250, 12, 14))
  }

  test("paeth predictor matches the spec's tie-break order") {
    assert(PngCodec.paeth(0, 0, 0) == 0)
    assert(PngCodec.paeth(5, 9, 9) == 5)   // pa=4 pb=0? p=5 → pa=0: picks a
    assert(PngCodec.paeth(0, 10, 0) == 10) // pa=10 pb=0 → b
    assert(PngCodec.paeth(11, 4, 10) == 4) // worked example from the row test
  }

  test("round-trips every filter mode and the cycling fixture mode") {
    // all four direct color types: gray (0), gray+alpha (4), RGB (2),
    // RGBA (6) — the filter math is bpp-generic, so each must survive
    // every unfilter path
    for (mode <- Seq(-1, 0, 1, 2, 3, 4); ch <- Seq(1, 2, 3, 4)) {
      val w = 5; val h = 7
      val px = Array.fill(w * h * ch)(rng.nextInt(256))
      val img = PngCodec.decode(PngCodec.encode(w, h, ch, px, mode))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.toSeq == px.toSeq, s"mode=$mode ch=$ch")
    }
  }

  test("palette images decode to their PLTE-expanded RGB (every filter mode)") {
    val palette = Array.fill(17)(rng.nextInt(0x1000000))
    for (mode <- Seq(-1, 0, 1, 2, 3, 4)) {
      val w = 6; val h = 5
      val idx = Array.fill(w * h)(rng.nextInt(palette.length))
      val img = PngCodec.decode(
        PngCodec.encode(w, h, 1, idx, mode, palette = Some(palette)))
      assert(img.channels == 3, "palette decode must hand back real RGB samples")
      val want = idx.flatMap(i => Seq(
        (palette(i) >> 16) & 0xff, (palette(i) >> 8) & 0xff, palette(i) & 0xff))
      assert(img.pixels.toSeq == want.toSeq, s"mode=$mode")
    }
  }

  test("palette tRNS expands into a real alpha channel (RGBA out)") {
    val palette = Array(0xff0000, 0x00ff00, 0x0000ff, 0x102030)
    val alpha = Array(0, 128, 255) // entry 3 beyond the table → opaque
    val w = 4; val h = 3
    val idx = Array.fill(w * h)(rng.nextInt(palette.length))
    val img = PngCodec.decode(PngCodec.encode(w, h, 1, idx,
      palette = Some(palette), paletteAlpha = Some(alpha)))
    assert(img.channels == 4,
      "a tRNS-bearing palette image must decode with alpha, not opaque RGB")
    idx.zipWithIndex.foreach { case (i, p) =>
      assert(img.pixels(4 * p) == ((palette(i) >> 16) & 0xff))
      assert(img.pixels(4 * p + 1) == ((palette(i) >> 8) & 0xff))
      assert(img.pixels(4 * p + 2) == (palette(i) & 0xff))
      val wantA = if (i < alpha.length) alpha(i) else 255
      assert(img.pixels(4 * p + 3) == wantA, s"alpha of palette entry $i")
    }
  }

  /** Splice a chunk into an encoded PNG immediately before its first
    * IDAT — the fixture builder for chunks `encode` doesn't emit. */
  private def splice(png: Array[Byte], typ: String, data: Array[Byte]): Array[Byte] = {
    val s = new String(png.map(b => (b & 0xff).toChar))
    val at = s.indexOf("IDAT") - 4 // back over the length field
    val extra = new java.io.ByteArrayOutputStream()
    PngCodec.chunk(extra, typ, data)
    png.take(at) ++ extra.toByteArray ++ png.drop(at)
  }

  test("a suggested-quantization PLTE on truecolor is validated and ignored") {
    // the spec explicitly permits PLTE in types 2/6 — common in the wild,
    // so it must not reject; the decode must equal the PLTE-free one
    val px = Array.fill(3 * 2 * 3)(rng.nextInt(256))
    val plain = PngCodec.encode(3, 2, 3, px)
    val withPlte = splice(plain, "PLTE",
      Array[Byte](10, 20, 30, 40, 50, 60))
    val img = PngCodec.decode(withPlte)
    assert(img.channels == 3 && img.pixels.toSeq == px.toSeq,
      "truecolor decode must ignore the suggested palette")
    // but a MALFORMED suggested palette still rejects
    val badPlte = splice(plain, "PLTE", Array[Byte](1, 2)) // not %3
    assert(intercept[IllegalArgumentException](PngCodec.decode(badPlte))
      .getMessage.contains("PLTE"))
    // and grayscale images still forbid the chunk outright (spec)
    val gray = PngCodec.encode(2, 2, 1, Array(1, 2, 3, 4))
    val grayPlte = splice(gray, "PLTE", Array[Byte](1, 2, 3))
    assert(intercept[IllegalArgumentException](PngCodec.decode(grayPlte))
      .getMessage.contains("grayscale"))
  }

  test("type-0/2 color-key tRNS expands into an alpha plane") {
    // gray: key = 7 → those pixels go transparent, channels 1 → 2
    val gpx = Array(7, 8, 7, 9)
    val gray = splice(PngCodec.encode(2, 2, 1, gpx), "tRNS",
      Array[Byte](0, 7))
    val gimg = PngCodec.decode(gray)
    assert(gimg.channels == 2)
    assert(gimg.pixels.toSeq == Seq(7, 0, 8, 255, 7, 0, 9, 255))
    // RGB: key = (1,2,3) → RGBA with alpha 0 only on exact triple match
    val cpx = Array(1, 2, 3, /**/ 1, 2, 4, /**/ 1, 2, 3, /**/ 9, 9, 9)
    val rgb = splice(PngCodec.encode(2, 2, 3, cpx), "tRNS",
      Array[Byte](0, 1, 0, 2, 0, 3))
    val cimg = PngCodec.decode(rgb)
    assert(cimg.channels == 4)
    assert(cimg.pixels.toSeq == Seq(
      1, 2, 3, 0, 1, 2, 4, 255, 1, 2, 3, 0, 9, 9, 9, 255))
  }

  test("tRNS on an alpha-bearing colorType rejects loudly (spec-forbidden)") {
    val rgba = PngCodec.encode(2, 1, 4, Array(1, 2, 3, 4, 5, 6, 7, 8))
    val bad = splice(rgba, "tRNS", Array[Byte](0, 1))
    assert(intercept[IllegalArgumentException](PngCodec.decode(bad))
      .getMessage.contains("forbidden"))
  }

  test("palette misuse is rejected loudly (encode-side guards)") {
    val palette = Array(0xff0000, 0x00ff00)
    // an in-range encode, then vandalize one index byte past the PLTE —
    // decode must reject, not read garbage memory
    intercept[IllegalArgumentException] {
      PngCodec.encode(2, 1, 1, Array(0, 5), palette = Some(palette))
    }
    intercept[IllegalArgumentException] { // palette with multi-channel pixels
      PngCodec.encode(1, 1, 3, Array(1, 2, 3), palette = Some(palette))
    }
  }

  test("round-trips randomized dims (30 trials, split IDAT always)") {
    (1 to 30).foreach { _ =>
      val w = 1 + rng.nextInt(12); val h = 1 + rng.nextInt(9)
      val ch = 3 + rng.nextInt(2)
      val px = Array.fill(w * h * ch)(rng.nextInt(256))
      val img = PngCodec.decode(PngCodec.encode(w, h, ch, px))
      assert(img.pixels.toSeq == px.toSeq)
    }
  }

  test("16-bit samples round-trip with full precision (all non-palette types)") {
    // byte-level filtering with bpp = channels*2 (spec §9) — values above
    // 255 would corrupt under any sample-level shortcut, so draw from the
    // full 16-bit range
    Seq(1, 2, 3, 4).foreach { ch =>
      (1 to 5).foreach { _ =>
        val w = 1 + rng.nextInt(10); val h = 1 + rng.nextInt(7)
        val px = Array.fill(w * h * ch)(rng.nextInt(65536))
        val img = PngCodec.decode(PngCodec.encode(w, h, ch, px, depth = 16))
        assert(img.depth == 16 && img.channels == ch)
        assert(img.pixels.toSeq == px.toSeq, s"16-bit ch=$ch round-trip")
      }
    }
  }

  test("Adam7 interlaced images round-trip at depth 8 and 16") {
    // dims swept across the 8x8 Adam7 tile boundary so empty passes,
    // single-pixel passes, and full passes all occur; the encoder's
    // filter cycle continues across passes, so every pass mixes filters
    for (w <- Seq(1, 2, 3, 7, 8, 9, 13); h <- Seq(1, 2, 5, 8, 11); d <- Seq(8, 16)) {
      val ch = 1 + rng.nextInt(4)
      val px = Array.fill(w * h * ch)(rng.nextInt(1 << d))
      val img = PngCodec.decode(
        PngCodec.encode(w, h, ch, px, depth = d, interlace = true))
      assert(img.width == w && img.height == h && img.channels == ch && img.depth == d)
      assert(img.pixels.toSeq == px.toSeq, s"Adam7 ${w}x$h ch=$ch d=$d")
    }
    // interlaced ≡ sequential: the same raster through both layouts
    val px = Array.fill(9 * 9 * 3)(rng.nextInt(256))
    val a = PngCodec.decode(PngCodec.encode(9, 9, 3, px, interlace = true))
    val b = PngCodec.decode(PngCodec.encode(9, 9, 3, px))
    assert(a.pixels.toSeq == b.pixels.toSeq)
  }

  test("sub-byte grayscale round-trips at depths 1/2/4 (every filter mode, odd widths)") {
    // odd widths so the last byte of every row is PADDED mid-byte (spec
    // §7.2) — an unpacker that reads past the pad or packs LSB-first
    // cannot round-trip these
    for (depth <- Seq(1, 2, 4); mode <- Seq(-1, 0, 1, 2, 3, 4)) {
      val w = 11; val h = 7
      val px = Array.fill(w * h)(rng.nextInt(1 << depth))
      val img = PngCodec.decode(PngCodec.encode(w, h, 1, px, mode, depth = depth))
      assert(img.width == w && img.height == h && img.channels == 1)
      assert(img.depth == depth, s"decode must keep native depth $depth")
      assert(img.pixels.toSeq == px.toSeq, s"depth=$depth mode=$mode")
    }
  }

  test("sub-byte palette images decode to PLTE-expanded RGB") {
    for (depth <- Seq(1, 2, 4)) {
      val palette = Array.fill(1 << depth)(rng.nextInt(0x1000000))
      val w = 9; val h = 5
      val idx = Array.fill(w * h)(rng.nextInt(palette.length))
      val img = PngCodec.decode(
        PngCodec.encode(w, h, 1, idx, depth = depth, palette = Some(palette)))
      assert(img.channels == 3 && img.depth == 8)
      val want = idx.flatMap(i => Seq(
        (palette(i) >> 16) & 0xff, (palette(i) >> 8) & 0xff, palette(i) & 0xff))
      assert(img.pixels.toSeq == want.toSeq, s"depth=$depth")
    }
  }

  test("sub-byte Adam7 interlaced images round-trip (pass rows pad independently)") {
    // 13x11 crosses the 8x8 tile boundary, so all seven passes are
    // non-empty AND several pass widths are odd — each pass row must
    // byte-pad on its own, not on the frame width
    for (depth <- Seq(1, 2, 4)) {
      val w = 13; val h = 11
      val px = Array.fill(w * h)(rng.nextInt(1 << depth))
      val seq = PngCodec.decode(PngCodec.encode(w, h, 1, px, depth = depth))
      val adam = PngCodec.decode(
        PngCodec.encode(w, h, 1, px, depth = depth, interlace = true))
      assert(adam.pixels.toSeq == px.toSeq, s"depth=$depth interlaced")
      assert(adam.pixels.toSeq == seq.pixels.toSeq, "interlaced must equal sequential")
    }
  }

  test("sub-byte gray color-key tRNS expands at native depth") {
    val depth = 2
    val w = 5; val h = 3
    val px = Array(0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2)
    val keyed = PngCodec.encode(w, h, 1, px, depth = depth)
    // splice a gray tRNS (key = 2) in front of IDAT: re-encode with the
    // codec's own chunk writer
    val img = PngCodec.decode(withGrayTrns(keyed, 2))
    assert(img.channels == 2 && img.depth == depth)
    px.zipWithIndex.foreach { case (v, i) =>
      assert(img.pixels(2 * i) == v)
      assert(img.pixels(2 * i + 1) == (if (v == 2) 0 else 3),
        s"alpha of sample $v at $i (opaque = 2^depth-1)")
    }
    // a key outside the sub-byte sample range must reject loudly
    val bad = intercept[IllegalArgumentException] {
      PngCodec.decode(withGrayTrns(keyed, 9))
    }
    assert(bad.getMessage.contains("2-bit"), bad.getMessage)
  }

  test("sub-byte misuse is rejected loudly") {
    // multi-channel sub-byte is illegal per spec §11.2.2
    val e1 = intercept[IllegalArgumentException] {
      PngCodec.encode(4, 4, 3, Array.fill(48)(1), depth = 4)
    }
    assert(e1.getMessage.contains("grayscale or palette"), e1.getMessage)
    // a palette bigger than the depth can index is a fixture bug
    val e2 = intercept[IllegalArgumentException] {
      PngCodec.encode(4, 4, 1, Array.fill(16)(0), depth = 2,
        palette = Some(Array.fill(5)(0x123456)))
    }
    assert(e2.getMessage.contains("indexes only 4"), e2.getMessage)
    // decode-side: depth 4 on truecolor rejects with the legal-set
    // message (hand-built IHDR, CRC valid via the codec's chunk writer)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(3).putInt(3).put(4.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    PngCodec.chunk(bos, "IHDR", ihdr)
    val e3 = intercept[IllegalArgumentException] { PngCodec.decode(bos.toByteArray) }
    assert(e3.getMessage.contains("illegal depth 4 for colorType 2"), e3.getMessage)
  }

  /** Rebuild `png` with a gray tRNS chunk (2-byte big-endian `key`)
    * spliced before the first IDAT — fixture surgery via the codec's
    * own chunk writer, CRCs intact. */
  private def withGrayTrns(png: Array[Byte], key: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, 8)
    var at = 8
    var spliced = false
    while (at < png.length) {
      val len = java.nio.ByteBuffer.wrap(png, at, 4).getInt
      val typ = new String(png, at + 4, 4, "US-ASCII")
      if (typ == "IDAT" && !spliced) {
        PngCodec.chunk(out, "tRNS", Array(((key >> 8) & 0xff).toByte, (key & 0xff).toByte))
        spliced = true
      }
      out.write(png, at, len + 12)
      at += len + 12
    }
    out.toByteArray
  }

  test("16-bit color-key tRNS compares the full two-byte key") {
    // gray16: key = 0x0107 must match ONLY the 16-bit value 263, not its
    // low byte 7 — the misread the 8-bit high-byte reject guards against
    val gpx = Array(263, 7, 263, 500)
    val gray = splice(PngCodec.encode(2, 2, 1, gpx, depth = 16), "tRNS",
      Array[Byte](1, 7))
    val gimg = PngCodec.decode(gray)
    assert(gimg.channels == 2 && gimg.depth == 16)
    assert(gimg.pixels.toSeq == Seq(263, 0, 7, 65535, 263, 0, 500, 65535))
  }

  test("16-bit palette rejects loudly (spec-illegal)") {
    val good = PngCodec.encode(2, 1, 1, Array(0, 1),
      palette = Some(Array(0xff0000, 0x00ff00)))
    // patch IHDR depth 8 -> 16 and fix the CRC
    val bad = good.clone()
    bad(24) = 16
    val crc = new java.util.zip.CRC32(); crc.update(bad, 12, 4 + 13)
    val cv = crc.getValue.toInt
    bad(29) = (cv >> 24).toByte; bad(30) = (cv >> 16).toByte
    bad(31) = (cv >> 8).toByte; bad(32) = cv.toByte
    assert(intercept[IllegalArgumentException](PngCodec.decode(bad))
      .getMessage.contains("illegal depth 16 for colorType 3"))
    // encoder refuses the combination outright
    assert(intercept[IllegalArgumentException](
      PngCodec.encode(2, 1, 1, Array(0, 1), depth = 16,
        palette = Some(Array(0xff0000, 0x00ff00))))
      .getMessage.contains("16-bit palettes are illegal"))
  }

  test("rejects malformed input loudly") {
    val px = Array.tabulate(2 * 2 * 3)(i => i * 17 % 256)
    val good = PngCodec.encode(2, 2, 3, px)
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(good.drop(1))).getMessage.contains("signature"))
    // tamper with an IDAT byte → CRC must catch it
    val tampered = good.clone()
    val idatPos = {
      // find "IDAT" and flip a payload byte after it
      val s = new String(good.map(b => (b & 0xff).toChar))
      s.indexOf("IDAT") + 4
    }
    tampered(idatPos) = (tampered(idatPos) ^ 0x55).toByte
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(tampered)).getMessage.contains("CRC"))
    // LYING interlace flag: patch IHDR's interlace byte AND fix the CRC
    // on a non-interlaced stream — Adam7 is now SUPPORTED, so the decoder
    // must catch the mismatch via the pass-structure size check (the
    // sequential 2x2 stream is 14 bytes; the Adam7 passes need 15), never
    // scatter garbage
    val inter = good.clone()
    inter(28) = 1
    val crc = new java.util.zip.CRC32(); crc.update(inter, 12, 4 + 13)
    val cv = crc.getValue.toInt
    inter(29) = (cv >> 24).toByte; inter(30) = (cv >> 16).toByte
    inter(31) = (cv >> 8).toByte; inter(32) = cv.toByte
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(inter)).getMessage.contains("inflated size"))
    // an invalid interlace METHOD still rejects on the field
    val badInter = good.clone()
    badInter(28) = 2
    val crc2 = new java.util.zip.CRC32(); crc2.update(badInter, 12, 4 + 13)
    val cv2 = crc2.getValue.toInt
    badInter(29) = (cv2 >> 24).toByte; badInter(30) = (cv2 >> 16).toByte
    badInter(31) = (cv2 >> 8).toByte; badInter(32) = cv2.toByte
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(badInter)).getMessage.contains("interlace"))
    // truncation (IEND gone) fails as a truncated chunk header
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(good.dropRight(12))).getMessage.contains("truncated"))
  }

  // hand-built chunks for the malformed-stream tests: the encoder cannot
  // emit FDICT or a truncated-but-CRC-valid IDAT, so these are assembled
  // byte-by-byte (length + tag + payload + CRC per PNG §5.3)
  private def rawChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write(v >> 24); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    be32(data.length)
    val tb = tag.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
    be32(crc.getValue.toInt)
    out.toByteArray
  }

  private def pngOf(idat: Array[Byte]): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(2.toByte) // 2x2 RGB, depth 8
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array.concat(
      Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      rawChunk("IHDR", ihdr), rawChunk("IDAT", idat),
      rawChunk("IEND", Array.empty[Byte]))
  }

  test("rejects a preset-dictionary (FDICT) zlib stream instead of hanging") {
    // Inflater.inflate returns 0 with finished()==false AND
    // needsInput()==false on an FDICT stream — before the r8 ADVICE fix
    // the inflate loop never advanced (a hang, not a loud reject). The
    // test TERMINATING with the precise IAE is itself the regression
    // proof. CMF=0x78 FLG=0x20: FDICT bit set and (0x7820 = 31·992)
    // passes the RFC 1950 %31 header check, so Inflater accepts it and
    // asks for the dictionary; 4 trailing bytes are the DICTID.
    val fdictIdat = Array(0x78, 0x20, 1, 2, 3, 4).map(_.toByte)
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(pngOf(fdictIdat))).getMessage.contains("preset-dictionary"))
  }

  test("a genuinely truncated DEFLATE stream reports the precise byte count") {
    // the r8 ADVICE dead-code finding: the generic require shadowed the
    // detailed 'got N of M bytes' message — now the detailed one emits.
    // Deflate the full 2x2 filtered raster (14 bytes), then keep only the
    // first half of the zlib stream inside a CRC-valid IDAT chunk.
    val raw = Array.tabulate(2 * (1 + 2 * 3))(i => (i * 31 % 256).toByte)
    for (i <- Seq(0, 7)) raw(i) = 0 // filter byte 0 per row
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](256)
    val n = defl.deflate(buf); defl.end()
    val truncated = buf.take(n / 2)
    val msg = intercept[IllegalArgumentException](
      PngCodec.decode(pngOf(truncated))).getMessage
    assert(msg.contains("truncated IDAT stream: got"), msg)
  }

  test("decodePng query emits decoder-derived features on the fixture corpus") {
    import TestSpark._
    val rows = graft.ops.Multimodal.decodePng(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (3 + id % 5).toInt, "width")
      assert(r.getInt(2) == (2 + id % 4).toInt, "height")
      assert(r.getInt(3) == (3 + id % 2).toInt, "channels")
      assert(r.getInt(9) <= 255, "peak is a byte")
    }
  }
}
