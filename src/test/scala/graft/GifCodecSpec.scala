package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GifCodec

/** GIF codec tests. GIF is lossless, so every conformance comparison is
  * EXACT — and the JDK ships an independent GIF implementation
  * (javax.imageio), so BOTH directions pin against external code that
  * shares nothing with this codec: ImageIO must read graft-encoded
  * files back pixel-identical, and graft must decode ImageIO-written
  * files pixel-identical. */
class GifCodecSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0x61f)

  // ---- LZW layer ----

  test("LZW round-trips: palette widths, runs (KwKwK), dictionary overflow") {
    for (minCode <- Seq(2, 3, 5, 8); trial <- 0 until 3) {
      val n = 1 << minCode
      val len = Seq(1, 37, 5000, 20000)(trial.min(3))
      val data = new Array[Byte](len)
      trial match {
        case 0 => // single index
          data(0) = (n - 1).toByte
        case 1 => // pure run: KwKwK on the second code
          java.util.Arrays.fill(data, (trial % n).toByte)
        case _ => // random with runs mixed in; 20k forces dict overflow+clear
          var i = 0
          while (i < len) {
            if (rng.nextInt(4) == 0) {
              val v = rng.nextInt(n).toByte
              val r = 1 + rng.nextInt(20)
              (0 until r).foreach { j => if (i + j < len) data(i + j) = v }
              i += r
            } else { data(i) = rng.nextInt(n).toByte; i += 1 }
          }
      }
      val decoded = GifCodec.lzwDecode(minCode,
        GifCodec.lzwEncode(minCode, data), data.length)
      assert(decoded.sameElements(data), s"minCode=$minCode trial=$trial len=$len")
    }
  }

  test("interlace row order is the spec's 8/8/4/2 pass structure") {
    assert(GifCodec.deinterlaceRows(10).toSeq == Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    assert(GifCodec.deinterlaceRows(1).toSeq == Seq(0))
    (1 to 40).foreach(h =>
      assert(GifCodec.deinterlaceRows(h).sorted.toSeq == (0 until h), s"h=$h"))
  }

  // ---- full-container round-trips ----

  private def randPalette(n: Int): Array[Int] =
    Array.fill(n)(rng.nextInt(0x1000000))

  test("container round-trips: palette sizes, interlace, transparency, multi-frame, offsets") {
    for (trial <- 0 until 8) {
      val nCol = Seq(4, 8, 16, 64, 256, 5, 33, 200)(trial)
      val pal = randPalette(nCol)
      val w = 3 + rng.nextInt(30); val h = 2 + rng.nextInt(25)
      val interlace = trial % 2 == 0
      val transparent = if (trial % 3 == 0) rng.nextInt(nCol) else -1
      val nFrames = 1 + trial % 3
      val frames = (0 until nFrames).map { f =>
        val fw = math.max(1, w - f); val fh = math.max(1, h - f)
        (f, f, fw, fh, Array.fill(fw * fh)(rng.nextInt(nCol).toByte))
      }
      val gif = GifCodec.decode(GifCodec.encode(w + nFrames, h + nFrames, pal,
        frames, interlace, transparent, delayCs = 4))
      assert(gif.frames.length == nFrames, s"trial $trial frame count")
      frames.zip(gif.frames).foreach { case ((l, t, fw, fh, idx), fr) =>
        assert(fr.left == l && fr.top == t && fr.width == fw && fr.height == fh)
        for (i <- 0 until fw * fh) {
          val expected =
            if ((idx(i) & 0xff) == transparent) pal(idx(i) & 0xff) & 0xffffff
            else 0xff000000 | pal(idx(i) & 0xff)
          assert(fr.pixels(i) == expected, s"trial $trial px $i")
        }
      }
    }
  }

  // ---- EXTERNAL conformance: javax.imageio both directions ----

  private def imageIoRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  test("ImageIO decodes graft-encoded GIFs pixel-identically (encoder conformance)") {
    for (trial <- 0 until 6) {
      val nCol = Seq(4, 16, 256, 7, 64, 130)(trial)
      val pal = randPalette(nCol)
      val w = 5 + rng.nextInt(40); val h = 4 + rng.nextInt(30)
      val idx = Array.fill(w * h)(rng.nextInt(nCol).toByte)
      val interlace = trial % 2 == 1
      val bytes = GifCodec.encode(w, h, pal, Seq((0, 0, w, h, idx)), interlace)
      val img = imageIoRead(bytes)
      assert(img.getWidth == w && img.getHeight == h, s"trial $trial dims")
      for (y <- 0 until h; x <- 0 until w) {
        val expected = 0xff000000 | pal(idx(y * w + x) & 0xff)
        assert(img.getRGB(x, y) == expected, s"trial $trial ($x,$y)")
      }
      // and transparency: ImageIO must see alpha 0 exactly where declared
      val t = rng.nextInt(nCol)
      val bt = GifCodec.encode(w, h, pal, Seq((0, 0, w, h, idx)),
        interlace, transparentIndex = t)
      val imgT = imageIoRead(bt)
      for (y <- 0 until h; x <- 0 until w) {
        val i = idx(y * w + x) & 0xff
        val expected = if (i == t) 0 else 0xff000000 | pal(i)
        // ImageIO reports transparent pixels with alpha 0 (rgb bits free)
        if (i == t) assert((imgT.getRGB(x, y) >>> 24) == 0, s"alpha ($x,$y)")
        else assert(imgT.getRGB(x, y) == expected, s"trial $trial T ($x,$y)")
      }
    }
  }

  test("graft decodes ImageIO-written GIFs pixel-identically (decoder conformance)") {
    for (trial <- 0 until 6) {
      val nCol = Seq(4, 16, 256, 8, 32, 128)(trial)
      val pal = randPalette(nCol)
      val w = 5 + rng.nextInt(40); val h = 4 + rng.nextInt(30)
      val idx = Array.fill(w * h)(rng.nextInt(nCol))
      val cm = new java.awt.image.IndexColorModel(8, nCol,
        pal.map(c => ((c >> 16) & 0xff).toByte),
        pal.map(c => ((c >> 8) & 0xff).toByte),
        pal.map(c => (c & 0xff).toByte))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, idx(y * w + x))
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", baos), "ImageIO wrote")
      val gif = GifCodec.decode(baos.toByteArray)
      assert(gif.frames.length == 1)
      val fr = gif.frames.head
      assert(fr.width == w && fr.height == h, s"trial $trial dims")
      for (y <- 0 until h; x <- 0 until w)
        assert((fr.pixels(y * w + x) & 0xffffff) == pal(idx(y * w + x)),
          s"trial $trial ($x,$y)")
    }
  }

  test("animated multi-frame GIF from ImageIO's sequence writer decodes frame-accurate") {
    val w = 17; val h = 11
    val pal = randPalette(16)
    val cm = new java.awt.image.IndexColorModel(8, 16,
      pal.map(c => ((c >> 16) & 0xff).toByte),
      pal.map(c => ((c >> 8) & 0xff).toByte),
      pal.map(c => (c & 0xff).toByte))
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 3 + y * 5 + f * 7) % 16)
      img
    }
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val mos = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(mos)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    mos.close()
    val gif = GifCodec.decode(baos.toByteArray)
    assert(gif.frames.length == 3, s"got ${gif.frames.length} frames")
    gif.frames.zipWithIndex.foreach { case (fr, f) =>
      for (y <- 0 until h; x <- 0 until w)
        assert((fr.pixels(y * w + x) & 0xffffff) == pal((x * 3 + y * 5 + f * 7) % 16),
          s"frame $f ($x,$y)")
    }
  }

  // ---- loud rejects ----

  test("malformed streams reject with precise messages") {
    val good = GifCodec.encode(4, 4, randPalette(4),
      Seq((0, 0, 4, 4, Array.fill(16)(1.toByte))))
    assert(intercept[IllegalArgumentException](
      GifCodec.decode("NOTGIF".getBytes ++ good.drop(6))).getMessage.contains("signature"))
    // truncation mid-image must not loop or misread
    intercept[IllegalArgumentException](GifCodec.decode(good.dropRight(8)))
    // an unknown block byte rejects by offset
    val bad = good.clone()
    // first block after header+GCT: find the 0x2c and corrupt it
    val at = bad.indices.find(i => (bad(i) & 0xff) == 0x2c).get
    bad(at) = 0x7f.toByte
    assert(intercept[IllegalArgumentException](
      GifCodec.decode(bad)).getMessage.contains("unknown GIF block"))
    // a frame exceeding the logical screen rejects
    assert(intercept[IllegalArgumentException](
      GifCodec.decode(GifCodec.encode(3, 3, randPalette(4),
        Seq((1, 1, 3, 3, Array.fill(9)(0.toByte)))))).getMessage.contains("logical screen"))
  }
}
