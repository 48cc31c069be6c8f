package graft.ops

/** From-scratch MPEG-1 video (ISO/IEC 11172-2) INTRA decoder — the
  * "one real compressed codec" closing the multimodal column family:
  * sequence header → first I-picture → slices → intra macroblocks →
  * DC/AC coefficient VLCs → dequant (with mismatch oddification) →
  * 8×8 IDCT → clamped luma plane. Pure JVM, zero dependencies.
  *
  * Scope (disclosed):
  *  - INTRA ONLY: the first I-picture of a video elementary stream is
  *    decoded; P/B pictures need motion compensation and are not
  *    attempted (the keyframe is what a frame-sampling corpus
  *    pipeline extracts anyway — the MJPEG path's contract).
  *  - The AC coefficient table (11172-2 table 2-B.5c/d, the shared
  *    H.262 B.14) is implemented through the 14-bit code group plus
  *    the full ESCAPE path (which can express every (run ≤ 63,
  *    |level| ≤ 255) pair); the rare 15/16-bit tail codes return a
  *    clean parse failure — callers fall back to the hash stub
  *    rather than decode silently-corrupt pixels.
  *  - Chroma blocks are fully PARSED (bitstream sync) but features
  *    derive from luma, matching [[Multimodal.mjpegFrames]].
  *
  * All tables are transcribed from the published standard (VLC code
  * maps, default intra quantizer matrix, zigzag order); the IDCT is
  * the definitional separable form in doubles.
  */
object Mpeg1 {

  /** A decoded intra frame: dimensions + row-major luma (0–255). */
  final case class Frame(width: Int, height: Int, luma: Array[Int])

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    def bit(): Int = {
      val b = (bytes((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def peek(n: Int): Int = {
      val save = pos
      val v = bits(n)
      pos = save
      v
    }
    def byteAlign(): Unit = pos = (pos + 7) & ~7L
    def bytesLeft: Int = bytes.length - (pos >> 3).toInt
  }

  // zigzag scan order: scan index -> raster index
  private val Zigzag: Array[Int] = Array(
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // default intra quantizer matrix (raster order)
  private val DefaultIntraQ: Array[Int] = Array(
     8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** dct_dc_size_luminance VLC (table 2-B.5a): (prefixLen, prefix) -> size. */
  private def dcSizeLuma(r: BitReader): Int = {
    // codes: 100->0, 00->1, 01->2, 101->3, 110->4, 1110->5,
    // 11110->6, 111110->7, 1111110->8
    if (r.bit() == 0) { if (r.bit() == 0) 1 else 2 }
    else {
      if (r.bit() == 0) { if (r.bit() == 0) 0 else 3 } // 10x
      else { // 11...
        if (r.bit() == 0) 4
        else if (r.bit() == 0) 5
        else if (r.bit() == 0) 6
        else if (r.bit() == 0) 7
        else if (r.bit() == 0) 8
        else throw new Mpeg1ParseException("bad dc luma size code")
      }
    }
  }

  /** dct_dc_size_chrominance VLC (table 2-B.5b). */
  private def dcSizeChroma(r: BitReader): Int = {
    // 00->0, 01->1, 10->2, 110->3, 1110->4, 11110->5, 111110->6,
    // 1111110->7, 11111110->8
    val b0 = r.bit()
    if (b0 == 0) { if (r.bit() == 0) 0 else 1 }
    else {
      if (r.bit() == 0) 2
      else if (r.bit() == 0) 3
      else if (r.bit() == 0) 4
      else if (r.bit() == 0) 5
      else if (r.bit() == 0) 6
      else if (r.bit() == 0) 7
      else if (r.bit() == 0) 8
      else throw new Mpeg1ParseException("bad dc chroma size code")
    }
  }

  private def dcDiff(r: BitReader, size: Int): Int =
    if (size == 0) 0
    else {
      val v = r.bits(size)
      if ((v & (1 << (size - 1))) != 0) v else v - ((1 << size) - 1)
    }

  /** macroblock_address_increment VLC (table 2-B.1). Returns the
    * increment; handles stuffing and the +33 escape. */
  private def mbAddressIncrement(r: BitReader): Int = {
    var inc = 0
    while (true) {
      if (r.bit() == 1) return inc + 1                        // '1'
      // '0...'
      if (r.bit() == 1) {                                     // '01x'
        return inc + (if (r.bit() == 1) 2 else 3)             // 011=2 010=3
      }
      // '00...'
      if (r.bit() == 1) {                                     // '001x'
        return inc + (if (r.bit() == 1) 4 else 5)             // 0011=4 0010=5
      }
      // '000...'
      if (r.bit() == 1) {                                     // '0001x'
        return inc + (if (r.bit() == 1) 6 else 7)             // 00011=6 00010=7
      }
      // '0000...'
      if (r.bit() == 1) {                                     // '00001xx'
        val t = r.bits(2)                                     // 0000111=8 0000110=9
        t match {                                             // 0000101x/0000100x → 10..13
          case 3 => return inc + 8
          case 2 => return inc + 9
          case 1 => return inc + (if (r.bit() == 0) 11 else 10) // 00001011=10 00001010=11
          case 0 => return inc + (if (r.bit() == 0) 13 else 12) // 00001001=12 00001000=13
        }
      } else {
        // '00000...'
        if (r.bit() == 1) {                                   // '000001...'
          val t = r.bits(2)
          if (t == 3) return inc + 14                         // 00000111
          if (t == 2) return inc + 15                         // 00000110
          // 10/11-bit tail (increments 16..33) — never emitted by an
          // intra-only encoder laying out contiguous macroblocks;
          // fail cleanly rather than misdecode
          throw new Mpeg1ParseException("mb_address_increment >15 unsupported")
        }
        // '000000...'
        val t5 = r.bits(5)
        if (t5 == 0x0F) ()                                    // 00000001111 stuffing
        else if (t5 == 0x08) inc += 33                        // 00000001000 escape
        else throw new Mpeg1ParseException("bad mb_address_increment")
      }
    }
    inc
  }

  /** macroblock_type for I-pictures (table 2-B.2a): '1' intra,
    * '01' intra+quant. Returns true if a new quantizer scale follows. */
  private def mbTypeIntra(r: BitReader): Boolean =
    if (r.bit() == 1) false
    else if (r.bit() == 1) true
    else throw new Mpeg1ParseException("bad I-picture macroblock_type")

  /** One (run, level) step of the dct_coeff_next VLC (table 2-B.5c/d).
    * Returns null-sentinel run = -1 for EOB. Level carries its sign. */
  private def acCoeff(r: BitReader): (Int, Int) = {
    def signed(run: Int, level: Int): (Int, Int) =
      (run, if (r.bit() == 1) -level else level)
    if (r.bit() == 1) {
      if (r.bit() == 0) (-1, 0)                               // '10' EOB
      else signed(0, 1)                                       // '11s'
    } else if (r.bit() == 1) {                                // '01...'
      if (r.bit() == 1) signed(1, 1)                          // '011s'
      else if (r.bit() == 0) signed(0, 2)                     // '0100s'
      else signed(2, 1)                                       // '0101s'
    } else if (r.bit() == 1) {                                // '001...'
      if (r.bit() == 0) {                                     // '0010...'
        if (r.bit() == 1) signed(0, 3)                        // '00101s'
        else {                                                // '00100xxx' 8-bit group
          val t = r.bits(3)
          t match {
            case 0 => signed(13, 1); case 1 => signed(0, 6)
            case 2 => signed(12, 1); case 3 => signed(11, 1)
            case 4 => signed(3, 2);  case 5 => signed(1, 3)
            case 6 => signed(0, 5);  case 7 => signed(10, 1)
          }
        }
      } else {                                                // '0011x'
        if (r.bit() == 1) signed(3, 1) else signed(4, 1)      // 00111s / 00110s
      }
    } else if (r.bit() == 1) {                                // '0001xx'
      val t = r.bits(2)
      t match {
        case 0 => signed(7, 1); case 1 => signed(6, 1)
        case 2 => signed(1, 2); case 3 => signed(5, 1)
      }
    } else if (r.bit() == 1) {                                // '00001xx'
      val t = r.bits(2)
      t match {
        case 0 => signed(2, 2); case 1 => signed(9, 1)
        case 2 => signed(0, 4); case 3 => signed(8, 1)
      }
    } else if (r.bit() == 1) {                                // '000001' ESCAPE
      val run = r.bits(6)
      val l8 = r.bits(8)
      // extension-byte range check (ISO 11172-2 table B.5g): after
      // l8==0 the next byte must be 128..255, after l8==128 it must be
      // 1..127 — anything else is not an encodable level; fail the
      // parse cleanly (stub fallback) instead of decoding wrong pixels
      val level =
        if (l8 == 0) {
          val e = r.bits(8)
          if (e < 128) throw new Mpeg1ParseException(
            s"escape level extension byte $e out of range 128..255")
          e                                                   // +128..255
        } else if (l8 == 128) {
          val e = r.bits(8)
          if (e < 1 || e > 127) throw new Mpeg1ParseException(
            s"escape level extension byte $e out of range 1..127")
          -(256 - e)                                          // -255..-129
        }
        else if (l8 > 128) -(256 - l8)                        // -127..-1
        else l8                                               // 1..127
      (run, level)
    } else if (r.bit() == 1) {                                // '0000001xxx' 10-bit
      val t = r.bits(3)
      t match {
        case 0 => signed(16, 1); case 1 => signed(5, 2)
        case 2 => signed(0, 7);  case 3 => signed(2, 3)
        case 4 => signed(1, 4);  case 5 => signed(15, 1)
        case 6 => signed(14, 1); case 7 => signed(4, 2)
      }
    } else if (r.bit() == 1) {                                // '00000001xxxx' 12-bit
      val t = r.bits(4)
      t match {
        case 0  => signed(0, 11); case 1  => signed(8, 2)
        case 2  => signed(4, 3);  case 3  => signed(0, 10)
        case 4  => signed(2, 4);  case 5  => signed(7, 2)
        case 6  => signed(21, 1); case 7  => signed(20, 1)
        case 8  => signed(0, 9);  case 9  => signed(19, 1)
        case 10 => signed(18, 1); case 11 => signed(1, 5)
        case 12 => signed(3, 3);  case 13 => signed(0, 8)
        case 14 => signed(6, 2);  case 15 => signed(17, 1)
      }
    } else if (r.bit() == 1) {                                // '000000001xxxx' 13-bit
      val t = r.bits(4)
      t match {
        case 0  => signed(10, 2); case 1  => signed(9, 2)
        case 2  => signed(5, 3);  case 3  => signed(3, 4)
        case 4  => signed(2, 5);  case 5  => signed(1, 7)
        case 6  => signed(1, 6);  case 7  => signed(0, 15)
        case 8  => signed(0, 14); case 9  => signed(0, 13)
        case 10 => signed(0, 12); case 11 => signed(26, 1)
        case 12 => signed(25, 1); case 13 => signed(24, 1)
        case 14 => signed(23, 1); case 15 => signed(22, 1)
      }
    } else if (r.bit() == 1) {                                // '0000000001xxxx' 14-bit
      val t = r.bits(4)                                       // (0,31)..(0,16)
      signed(0, 31 - t)
    } else
      throw new Mpeg1ParseException(
        "15/16-bit AC code tail unsupported (escape covers those levels)")
  }

  private final class Mpeg1ParseException(msg: String)
      extends RuntimeException(msg)

  /** Definitional separable 8×8 inverse DCT (doubles), output rounded. */
  private def idct8x8(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    val c = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
    val cosTab = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16.0))
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            s += c(u) * c(v) * coef(v * 8 + u) * cosTab(x)(u) * cosTab(y)(v)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = math.round(s / 4.0).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  private def findStartCode(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) return i
      i += 1
    }
    -1
  }

  /** True if the bytes begin with an MPEG-1 video sequence header. */
  def isMpeg1Video(bytes: Array[Byte]): Boolean =
    bytes.length > 12 && bytes(0) == 0 && bytes(1) == 0 &&
      bytes(2) == 1 && (bytes(3) & 0xff) == 0xB3

  /** Decodes the first I-picture's luma plane. Returns None on any
    * parse failure (unsupported tail codes, truncated stream,
    * non-intra first picture) — callers fall back to the hash stub. */
  def decodeFirstIFrame(bytes: Array[Byte]): Option[Frame] =
    try decode(bytes) catch { case _: Exception => None }

  private def decode(bytes: Array[Byte]): Option[Frame] = {
    if (!isMpeg1Video(bytes)) return None
    // ---- sequence header ----
    val sh = new BitReader(bytes, 4)
    val width = sh.bits(12)
    val height = sh.bits(12)
    sh.bits(4); sh.bits(4)          // aspect, picture_rate
    sh.bits(18); sh.bits(1)         // bit_rate, marker
    sh.bits(10); sh.bits(1)         // vbv, constrained
    val intraQ = DefaultIntraQ.clone()
    if (sh.bit() == 1) {            // load_intra_quantizer_matrix
      var i = 0
      while (i < 64) { intraQ(Zigzag(i)) = sh.bits(8); i += 1 }
    }
    if (sh.bit() == 1) sh.bits(8 * 64) // load_non_intra (skip)
    if (width <= 0 || height <= 0) return None
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    // luma plane at macroblock granularity, mid-gray default
    val lw = mbW * 16
    val lh = mbH * 16
    val luma = Array.fill(lw * lh)(128)

    // ---- find the first I-picture start code ----
    var off = findStartCode(bytes, 4)
    var picAt = -1
    while (off >= 0 && picAt < 0) {
      if ((bytes(off + 3) & 0xff) == 0x00) picAt = off
      off = findStartCode(bytes, off + 4)
    }
    if (picAt < 0) return None
    val ph = new BitReader(bytes, picAt + 4)
    ph.bits(10)                     // temporal_reference
    val picType = ph.bits(3)
    if (picType != 1) return None   // first picture must be I

    // ---- slices ----
    var sliceAt = findStartCode(bytes, picAt + 4)
    var sawSlice = false
    while (sliceAt >= 0) {
      val code = bytes(sliceAt + 3) & 0xff
      if (code >= 0x01 && code <= 0xAF) {
        sawSlice = true
        decodeSlice(bytes, sliceAt, code, mbW, intraQ, luma, lw)
      } else if (code == 0x00 || code == 0xB8 || code == 0xB3 || code == 0xB7) {
        // next picture / GOP / sequence: first frame done
        if (sawSlice) sliceAt = -4 // terminate (marker)
      }
      sliceAt = if (sliceAt == -4) -1 else findStartCode(bytes, sliceAt + 4)
    }
    if (!sawSlice) return None
    // crop to declared dims
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      System.arraycopy(luma, y * lw, out, y * width, width)
      y += 1
    }
    Some(Frame(width, height, out))
  }

  private def decodeSlice(bytes: Array[Byte], sliceAt: Int, code: Int,
                          mbW: Int, intraQ: Array[Int],
                          luma: Array[Int], lw: Int): Unit = {
    val r = new BitReader(bytes, sliceAt + 4)
    // bound every write to the picture's macroblock plane: a corrupt
    // slice_vertical_position or runaway mb_address_increment must be
    // a clean parse failure (stub fallback), not a silently
    // part-gray frame skipped by the per-pixel guard
    val mbH = luma.length / lw / 16
    if (code > mbH) throw new Mpeg1ParseException(
      s"slice_vertical_position $code beyond picture height ($mbH rows)")
    var qScale = r.bits(5)
    while (r.bit() == 1) r.bits(8)  // extra_information_slice
    // DC predictors (recon units, reset 1024); address from slice row
    var dcY = 1024; var dcCb = 1024; var dcCr = 1024
    var mbAddr = (code - 1) * mbW - 1
    val coefZz = new Array[Int](64)
    var run = true
    while (run) {
      // stop when the remaining bits are a start-code prefix / padding
      if (r.bytesLeft <= 0) { run = false }
      else if (r.peek(Math.min(23, (bytes.length * 8 - r.pos).toInt)) == 0) {
        run = false
      } else {
        val inc = mbAddressIncrement(r)
        if (inc != 1) { dcY = 1024; dcCb = 1024; dcCr = 1024 }
        mbAddr += inc
        if (mbAddr >= mbW * mbH) throw new Mpeg1ParseException(
          s"macroblock address $mbAddr beyond picture (${mbW * mbH} MBs)")
        val newQ = mbTypeIntra(r)
        if (newQ) qScale = r.bits(5)
        val mbX = (mbAddr % mbW) * 16
        val mbY = (mbAddr / mbW) * 16
        var blk = 0
        while (blk < 6) {
          java.util.Arrays.fill(coefZz, 0)
          // DC
          val size = if (blk < 4) dcSizeLuma(r) else dcSizeChroma(r)
          val diff = dcDiff(r, size) * 8
          val dc = blk match {
            case 0 | 1 | 2 | 3 => dcY += diff; dcY
            case 4             => dcCb += diff; dcCb
            case 5             => dcCr += diff; dcCr
          }
          coefZz(0) = dc
          // AC run/levels until EOB
          var idx = 0
          var eob = false
          while (!eob) {
            val (rn, lv) = acCoeff(r)
            if (rn < 0) eob = true
            else {
              idx += rn + 1
              if (idx > 63) throw new Mpeg1ParseException("AC index overflow")
              // dequant + mismatch oddification (Sign(0) = 0: a
              // zero-quantized coefficient stays zero)
              var f = (lv * qScale * intraQ(Zigzag(idx))) / 8
              if (f != 0 && (f & 1) == 0) f = if (f > 0) f - 1 else f + 1
              if (f > 2047) f = 2047
              if (f < -2048) f = -2048
              coefZz(Zigzag(idx)) = f
            }
          }
          if (blk < 4) {
            val px = idct8x8(coefZz)
            val ox = mbX + (blk & 1) * 8
            val oy = mbY + (blk >> 1) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                var v = px(yy * 8 + xx)
                if (v < 0) v = 0
                if (v > 255) v = 255
                val row = oy + yy
                val colx = ox + xx
                if (row * lw + colx < luma.length) luma(row * lw + colx) = v
                xx += 1
              }
              yy += 1
            }
          }
          // chroma blocks (4, 5): fully parsed above for bitstream
          // sync; pixel reconstruction is luma-only by design
          blk += 1
        }
      }
    }
  }

  /** Luma-statistics features of the first I-frame, shaped like
    * [[Multimodal]]'s other real decoders: (w, h, 8-dim feature). */
  private[graft] def mpeg1Features(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodeFirstIFrame(bytes).map { f =>
      val n = f.luma.length.toDouble
      var s = 0.0; var s2 = 0.0
      var mn = 255; var mx = 0
      var i = 0
      while (i < f.luma.length) {
        val v = f.luma(i)
        s += v; s2 += v.toDouble * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      val mean = s / n / 255.0
      val std = math.sqrt(math.max(0.0, s2 / n - (s / n) * (s / n))) / 255.0
      (f.width, f.height,
        Array(mean.toFloat, std.toFloat, mn / 255.0f, mx / 255.0f,
              f.width.toFloat, f.height.toFloat, 1.0f, 0.0f))
    }
}
