package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mpeg1

/** Spec-derived goldens for the from-scratch MPEG-1 intra decoder:
  * the test ASSEMBLES a conformant ISO 11172-2 bitstream bit by bit
  * (its own writer + its own copy of the DC-size/EOB code tables, in
  * the ENCODING direction) and checks the decoder against
  * closed-form expectations — a DC-only intra block reconstructs to
  * a flat patch at exactly the DC value (IDCT of F(0,0)=8·L is the
  * constant L), so no reference decoder is needed; the single-AC
  * case is checked against the definitional IDCT formula evaluated
  * inline. */
class Mpeg1Spec extends AnyFunSuite {

  private class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def putBits(s: String): Unit = s.foreach(c => put(c - '0', 1))
    def align(): Unit = while (nbits != 0) put(0, 1)
    def startCode(code: Int): Unit = { align(); put(0, 8); put(0, 8); put(1, 8); put(code, 8) }
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  /** Encoding-direction DC size tables (11172-2 2-B.5a/b). */
  private def lumaSizeCode(size: Int): String = size match {
    case 0 => "100"; case 1 => "00"; case 2 => "01"; case 3 => "101"
    case 4 => "110"; case 5 => "1110"; case 6 => "11110"
    case 7 => "111110"; case 8 => "1111110"
  }
  private def chromaSizeCode(size: Int): String = size match {
    case 0 => "00"; case 1 => "01"; case 2 => "10"; case 3 => "110"
    case 4 => "1110"; case 5 => "11110"; case 6 => "111110"
    case 7 => "1111110"; case 8 => "11111110"
  }

  private def writeDc(w: BitWriter, diff: Int, chroma: Boolean): Unit = {
    val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    w.putBits(if (chroma) chromaSizeCode(size) else lumaSizeCode(size))
    if (size > 0) {
      val v = if (diff > 0) diff else diff + (1 << size) - 1
      w.put(v, size)
    }
  }

  private val Eob = "10"

  /** Assemble a 32×32 I-frame: 2×2 macroblocks with flat lumas, plus
    * optionally one (run=0, level=+1) AC coefficient on the LAST
    * macroblock's first luma block. */
  private def makeStream(lumas: Seq[Int], withAc: Boolean): Array[Byte] = {
    val w = new BitWriter
    // sequence header: 32x32, aspect 1, rate 1, free bitrate
    w.startCode(0xB3)
    w.put(32, 12); w.put(32, 12)
    w.put(1, 4); w.put(1, 4)
    w.put(0x3FFFF, 18); w.put(1, 1)
    w.put(0, 10); w.put(0, 1)
    w.put(0, 1); w.put(0, 1)      // no custom matrices
    // I-picture header
    w.startCode(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16)
    w.put(0, 1)                    // extra_bit_picture = 0
    // one slice covering all four macroblocks, quantizer_scale 8
    w.startCode(0x01)
    w.put(8, 5); w.put(0, 1)       // qscale, extra_bit_slice = 0
    var dcY = 128                  // predictors in pixel units (recon/8)
    var dcCb = 128; var dcCr = 128
    for ((l, mi) <- lumas.zipWithIndex) {
      w.putBits("1")               // address increment +1
      w.putBits("1")               // macroblock_type: intra
      for (blk <- 0 until 6) {
        if (blk < 4) {
          val target = l
          writeDc(w, target - dcY, chroma = false)
          dcY = target
          if (withAc && mi == lumas.length - 1 && blk == 0)
            w.putBits("11" + "0")  // (run 0, level +1), sign 0
          w.putBits(Eob)
        } else {
          writeDc(w, 0, chroma = true)
          w.putBits(Eob)
        }
      }
    }
    w.startCode(0xB7)              // sequence end
    w.bytes
  }

  test("DC-only intra frame reconstructs flat macroblock patches exactly") {
    val lumas = Seq(50, 200, 100, 150)
    val f = Mpeg1.decodeFirstIFrame(makeStream(lumas, withAc = false)).get
    assert(f.width == 32 && f.height == 32)
    // each 16x16 macroblock is a flat patch at its DC value
    for ((l, mi) <- lumas.zipWithIndex) {
      val ox = (mi % 2) * 16
      val oy = (mi / 2) * 16
      for (y <- oy until oy + 16; x <- ox until ox + 16)
        assert(f.luma(y * 32 + x) == l,
          s"pixel ($x,$y) of mb $mi: got ${f.luma(y * 32 + x)}, want $l")
    }
  }

  test("single AC coefficient adds the definitional IDCT cosine ramp") {
    val lumas = Seq(50, 200, 100, 150)
    val f = Mpeg1.decodeFirstIFrame(makeStream(lumas, withAc = true)).get
    // the AC rides mb 3 (bottom-right), block 0 (its top-left 8x8):
    // level +1 at zigzag index 1 = raster (u=1, v=0); dequant:
    // (1 * 8 * 16) / 8 = 16, even -> oddified to 15. Definitional
    // IDCT contribution: (1/4)*C(1)*C(0)*15*cos((2x+1)*pi/16)
    for (y <- 16 until 24; x <- 16 until 24) {
      val ac = 0.25 * (1.0 / math.sqrt(2.0)) * 1.0 * 15.0 *
        math.cos((2 * (x - 16) + 1) * math.Pi / 16.0)
      // DC term: (1/4)*C(0)*C(0)*F00 = F00/8 = 150
      val want = math.round(150.0 + ac).toInt.max(0).min(255)
      assert(f.luma(y * 32 + x) == want,
        s"pixel ($x,$y): got ${f.luma(y * 32 + x)}, want $want")
    }
    // the other three 8x8 blocks of mb 3 stay flat at 150
    for (y <- 16 until 32; x <- 24 until 32)
      assert(f.luma(y * 32 + x) == 150)
  }

  test("custom intra quantizer matrix is honored (AC dequant changes)") {
    // same stream but with load_intra_quantizer_matrix = all 16s:
    // zigzag idx 1 weight becomes 16 (the default is also 16 there,
    // so use all 32s to see a difference: (1*8*32)/8 = 32 -> 31)
    val w = new BitWriter
    w.startCode(0xB3)
    w.put(32, 12); w.put(32, 12); w.put(1, 4); w.put(1, 4)
    w.put(0x3FFFF, 18); w.put(1, 1); w.put(0, 10); w.put(0, 1)
    w.put(1, 1)                     // load custom intra matrix
    for (_ <- 0 until 64) w.put(32, 8)
    w.put(0, 1)
    w.startCode(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
    w.startCode(0x01)
    w.put(8, 5); w.put(0, 1)
    // one macroblock: flat 100 + AC level +1
    w.putBits("1"); w.putBits("1")
    for (blk <- 0 until 6) {
      if (blk == 0) {
        writeDc(w, 100 - 128, chroma = false)
        w.putBits("11" + "0"); w.putBits(Eob)
      } else if (blk < 4) { writeDc(w, 0, chroma = false); w.putBits(Eob) }
      else { writeDc(w, 0, chroma = true); w.putBits(Eob) }
    }
    w.startCode(0xB7)
    val f = Mpeg1.decodeFirstIFrame(w.bytes).get
    // (1*8*32)/8 = 32 -> oddified 31
    val x = 0; val y = 0
    val ac = 0.25 * (1.0 / math.sqrt(2.0)) * 31.0 *
      math.cos((2 * x + 1) * math.Pi / 16.0)
    assert(f.luma(y * 32 + x) == math.round(100.0 + ac).toInt.max(0).min(255))
  }

  test("escape-coded AC level decodes (large level via the 24-bit escape)") {
    val w = new BitWriter
    w.startCode(0xB3)
    w.put(32, 12); w.put(32, 12); w.put(1, 4); w.put(1, 4)
    w.put(0x3FFFF, 18); w.put(1, 1); w.put(0, 10); w.put(0, 1)
    w.put(0, 1); w.put(0, 1)
    w.startCode(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
    w.startCode(0x01)
    w.put(8, 5); w.put(0, 1)
    w.putBits("1"); w.putBits("1")
    for (blk <- 0 until 6) {
      if (blk == 0) {
        writeDc(w, 0, chroma = false) // flat 128
        // escape: '000001', run=2 (6 bits), level=40 (8 bits)
        w.putBits("000001"); w.put(2, 6); w.put(40, 8)
        w.putBits(Eob)
      } else if (blk < 4) { writeDc(w, 0, chroma = false); w.putBits(Eob) }
      else { writeDc(w, 0, chroma = true); w.putBits(Eob) }
    }
    w.startCode(0xB7)
    val f = Mpeg1.decodeFirstIFrame(w.bytes).get
    // run 2 -> zigzag index 3 = raster 16 (u=0, v=2); dequant:
    // (40 * 8 * 19) / 8 = 760 -> even -> 759
    val ac = (y: Int) => 0.25 * (1.0 / math.sqrt(2.0)) * 759.0 *
      math.cos((2 * y + 1) * 2 * math.Pi / 16.0)
    for (y <- 0 until 8)
      assert(f.luma(y * 32) == math.round(128.0 + ac(y)).toInt.max(0).min(255),
        s"row $y: got ${f.luma(y * 32)}")
  }

  test("corrupt escape-level extension byte is a clean parse failure") {
    // r9/r10 advice pin: ISO 11172-2 table B.5g — after l8==0 the
    // extension byte must be 128..255; a value below that is not an
    // encodable level and must fall back to the stub (None), never
    // decode wrong pixels
    def streamWithExt(l8: Int, ext: Int): Array[Byte] = {
      val w = new BitWriter
      w.startCode(0xB3)
      w.put(32, 12); w.put(32, 12); w.put(1, 4); w.put(1, 4)
      w.put(0x3FFFF, 18); w.put(1, 1); w.put(0, 10); w.put(0, 1)
      w.put(0, 1); w.put(0, 1)
      w.startCode(0x00)
      w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
      w.startCode(0x01)
      w.put(8, 5); w.put(0, 1)
      w.putBits("1"); w.putBits("1")
      for (blk <- 0 until 6) {
        if (blk == 0) {
          writeDc(w, 0, chroma = false)
          w.putBits("000001"); w.put(2, 6); w.put(l8, 8); w.put(ext, 8)
          w.putBits(Eob)
        } else if (blk < 4) { writeDc(w, 0, chroma = false); w.putBits(Eob) }
        else { writeDc(w, 0, chroma = true); w.putBits(Eob) }
      }
      w.startCode(0xB7)
      w.bytes
    }
    assert(Mpeg1.decodeFirstIFrame(streamWithExt(0, 5)).isEmpty,
      "l8=0 ext<128 must fail the parse")
    assert(Mpeg1.decodeFirstIFrame(streamWithExt(128, 200)).isEmpty,
      "l8=128 ext>127 must fail the parse")
    // sanity: a VALID extension byte on the same stream shape decodes
    assert(Mpeg1.decodeFirstIFrame(streamWithExt(0, 130)).nonEmpty)
  }

  test("slice_vertical_position beyond the picture is a clean parse failure") {
    // r9/r10 advice pin: a corrupt slice start code addressing a row
    // past the declared height must not silently skip writes
    val good = makeStream(Seq(50, 200, 100, 150), withAc = false)
    // slice start code 0x01 (row 1) -> 0x07 (row 7 of a 2-mb-row pic)
    val bad = good.clone()
    var i = 0
    var patched = false
    while (i + 3 < bad.length && !patched) {
      if (bad(i) == 0 && bad(i + 1) == 0 && bad(i + 2) == 1 &&
          bad(i + 3) == 1) { bad(i + 3) = 7; patched = true }
      i += 1
    }
    assert(patched, "slice start code not found in fixture")
    assert(Mpeg1.decodeFirstIFrame(bad).isEmpty)
    assert(Mpeg1.decodeFirstIFrame(good).nonEmpty)
  }

  test("non-MPEG1 bytes and truncated streams return None (stub fallback)") {
    assert(Mpeg1.decodeFirstIFrame(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mpeg1.decodeFirstIFrame(
      makeStream(Seq(50, 200, 100, 150), withAc = false).take(20)).isEmpty)
    assert(!Mpeg1.isMpeg1Video("hello world bytes".getBytes))
  }

  test("Multimodal routes MPEG-1 streams to the real decoder") {
    val bytes = makeStream(Seq(0, 255, 0, 255), withAc = false)
    val feats = graft.ops.Mpeg1.mpeg1Features(bytes).get
    assert(feats._1 == 32 && feats._2 == 32)
    // half the pixels 0, half 255: mean 0.5, min 0, max 1
    assert(math.abs(feats._3(0) - 0.5f) < 1e-3)
    assert(feats._3(2) == 0.0f && feats._3(3) == 1.0f)
  }
}
