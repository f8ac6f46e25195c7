package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PpmCodec

/** Byte-level tests for the real binary-PPM (P6) codec: a hand-assembled
  * canonical file (header written out longhand, independent of the
  * encoder), comment/whitespace tokenization the Netpbm grammar requires,
  * encode→decode round-trips over randomized params, and loud rejection
  * of malformed input. The WavCodecSpec design, transposed to images. */
class PpmCodecSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0x99b)

  /** 2×2 RGB image assembled by hand — "P6\n2 2\n255\n" + 12 raster
    * bytes — so a shared encoder/decoder bug cannot self-certify. */
  private def handBuilt: Array[Byte] = {
    val raster = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 13, 200)
    "P6\n2 2\n255\n".getBytes("US-ASCII") ++ raster.map(_.toByte)
  }

  test("decodes a hand-assembled canonical P6 byte-for-byte") {
    val img = PpmCodec.decode(handBuilt)
    assert(img.width == 2 && img.height == 2 && img.maxVal == 255)
    assert(img.pixels.toSeq == Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 13, 200))
  }

  test("tokenizes headers with comments and mixed whitespace runs") {
    // the Netpbm grammar allows comments + arbitrary whitespace between
    // every token; a fixed-offset reader cannot parse this
    val weird = ("P6 # trailing comment on the magic line\n" +
      "# full comment line\n  2\t# width done\n\r 2 \n#maxval next\n255 ")
      .getBytes("US-ASCII") ++ handBuilt.drop(11)
    val img = PpmCodec.decode(weird)
    assert(img.width == 2 && img.height == 2 && img.maxVal == 255)
    assert(img.pixels.toSeq == PpmCodec.decode(handBuilt).pixels.toSeq)
  }

  test("raster may begin with whitespace-looking bytes (single separator)") {
    // first raster byte 0x0a ('\n'): only ONE whitespace byte separates
    // header from raster, so this byte must be read as a SAMPLE
    val bytes = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0x0a, 0x20, 0x23)
    val img = PpmCodec.decode(bytes)
    assert(img.pixels.toSeq == Seq(0x0a, 0x20, 0x23))
  }

  test("junk-comment fixtures are load-bearing for the tokenizer") {
    for (junk <- 0 to 4) {
      val px = Array.tabulate(3 * 2 * 3)(i => i * 11 % 256)
      val bytes = PpmCodec.encode(3, 2, 255, px, junk)
      assert(bytes.length == PpmCodec.headerLen(3, 2, 255, junk) + px.length,
        s"headerLen closed form, junk=$junk")
      val img = PpmCodec.decode(bytes)
      assert(img.width == 3 && img.height == 2 && img.pixels.toSeq == px.toSeq,
        s"junk=$junk")
    }
  }

  test("round-trips randomized params (40 trials)") {
    (1 to 40).foreach { _ =>
      val w = 1 + rng.nextInt(12); val h = 1 + rng.nextInt(9)
      val mv = 1 + rng.nextInt(255)
      val px = Array.fill(w * h * 3)(rng.nextInt(mv + 1))
      val junk = rng.nextInt(5)
      val img = PpmCodec.decode(PpmCodec.encode(w, h, mv, px, junk))
      assert(img.width == w && img.height == h && img.maxVal == mv)
      assert(img.pixels.toSeq == px.toSeq)
    }
  }

  test("rejects malformed input loudly") {
    val good = PpmCodec.encode(2, 2, 255, Array.fill(12)(9))
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode("P5".getBytes ++ good.drop(2))).getMessage.contains("P6"))
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(good.dropRight(1))).getMessage.contains("truncated"))
    // 2-byte samples: valid PPM, unsupported here — must fail loudly
    val wide = PpmCodec.encode(1, 1, 255, Array(1, 2, 3))
    val patched = new String(wide, "US-ASCII").replace("\n255\n", "\n65535\n")
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(patched.getBytes("US-ASCII") ++ Array[Byte](0, 0, 0)))
      .getMessage.contains("2-byte"))
    // missing token
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode("P6\n2\n".getBytes("US-ASCII"))).getMessage
      .contains("decimal"))
    // zero dims
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode("P6\n0 2\n255\n".getBytes("US-ASCII"))).getMessage
      .contains("dims"))
    // sample exceeding maxval
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode("P6\n1 1\n7\n".getBytes("US-ASCII") ++
        Array[Byte](9, 1, 1))).getMessage.contains("exceeds maxval"))
  }

  test("decodePpm query emits decoder-derived features on the fixture corpus") {
    import TestSpark._
    val rows = graft.ops.Multimodal.decodePpm(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == (4 + id % 5).toInt, "width")
      assert(r.getInt(3) == (3 + id % 4).toInt, "height")
      assert(r.getInt(4) == (63 + (id % 3) * 96).toInt, "max_val")
      assert(r.getInt(8) <= r.getInt(4), "peak bounded by maxval")
    }
  }
}
