package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, processed by a batched per-partition
  * decode stage — the Scala analog of a `mapInPandas` pipeline
  * (Iterator-of-batches in, Iterator-of-rows out; explicit schema via
  * Encoders; partitioning preserved, no shuffle).
  *
  * PNG, JPEG, GIF and BMP decode are REAL end-to-end (JDK-builtin
  * `ImageIO` — header dims AND pixel-statistics features), as are
  * 16-bit PCM WAV (chunk-walk metadata AND amplitude statistics —
  * PCM needs no codec), MP4 container metadata (ISO-BMFF box walk),
  * MP3 metadata (frame-header walk — published ISO 11172-3 header
  * math: duration/bitrate/rate/channels/frame count need no codec),
  * MJPEG-in-MP4 video (per-keyframe `ImageIO` decode → real luma
  * statistics, [[mjpegFrames]]) and — r9 — MPEG-1 VIDEO I-frames
  * (the from-scratch ISO 11172-2 intra decoder, [[Mpeg1]]: VLC
  * coefficient parse → dequant → IDCT → real luma statistics; the
  * "one real compressed codec" of the r8 verdict). Modern codec
  * FRAMES (H.264/H.265/VP9/AV1, MP3 samples) have no JDK decoder and
  * a from-scratch implementation is out of engineering scope (CABAC,
  * inter prediction, loop filters, hybrid filterbanks); they and
  * opaque blobs fall back to a clearly-marked STUB (deterministic
  * pseudo-features from a SHA-256 of the bytes), so the Spark-side
  * contract — schema, batch shape, typed boundaries, determinism —
  * is real and testable while the stub branch stays swappable for
  * e.g. a JNI codec.
  */
object Multimodal {

  // JVM-global, runs once per JVM when this object first loads (driver
  // AND executors — every decode path below is a member here): ImageIO
  // wraps non-file streams in a DISK-backed cache by default, creating
  // and deleting one /tmp file per image decode/encode. The in-memory
  // cache is bit-identical and removes thousands of per-image FS
  // round-trips per query (guide §6 I/O; also the source of the
  // multi-second run-to-run variance the image queries showed under
  // concurrent disk load).
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: id + raw bytes + mime hint. */
  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features: detected kind + per-modality metadata (image
    * dims / audio rate+channels) + an 8-dim float feature. */
  case class MediaFeatures(doc_id: Long, kind: String, width: Int, height: Int,
                           sample_rate: Int, channels: Int,
                           n_bytes: Int, feat: Array[Float])

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Real header parse for PNG: width/height from the IHDR chunk
    * (big-endian u32 at offsets 16 and 20 — the IHDR data follows the
    * 8-byte signature + 4-byte length + "IHDR" tag). Pure JVM, no codec
    * dependency. Returns None for non-PNG bytes. */
  private[graft] def pngDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 24 && bytes.take(8).sameElements(PngMagic)) {
      def u32(off: Int): Int =
        ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      Some((u32(16), u32(20)))
    } else None

  /** Real header parse for RIFF/WAVE: walks the chunk list to the
    * "fmt " chunk and reads channels (LE u16 at +2) and sample rate
    * (LE u32 at +4). Pure JVM. Returns None for non-WAV bytes. */
  private[graft] def wavMeta(bytes: Array[Byte]): Option[(Int, Int)] = {
    def tag(off: Int) = new String(bytes.slice(off, off + 4), "US-ASCII")
    def u16le(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32le(off: Int) =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    if (bytes.length < 36 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      // Chunk sizes are UNSIGNED u32 — walk with a Long cursor so a
      // hostile size (e.g. 0xFFFFFFF8) runs off the end and exits the
      // loop instead of wrapping to a non-advancing Int step.
      def szU(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      var off = 12L
      while (off + 8 <= bytes.length && tag(off.toInt) != "fmt ") {
        val sz = szU(off.toInt + 4)
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (off + 16 <= bytes.length && tag(off.toInt) == "fmt ")
        Some((u16le(off.toInt + 10), u32le(off.toInt + 12))) // (channels, sampleRate)
      else None
    }
  }

  /** Safe RIFF chunk walk shared by the PCM decoders: locates the
    * "fmt " and "data" chunks treating every u32 chunk size as an
    * unsigned Long. The cursor advances by >= 8 per chunk and lives
    * in Long space, so a hostile size field (0xFFFFFFF8 and friends)
    * runs past the buffer and exits — never an infinite loop, never
    * an index exception ("malformed bytes yield no rows, not
    * failures", the audioStats contract). Also bounds the fmt-chunk
    * field reads (fmtOff + 24 <= length). Returns
    * (fmtOff, dataOff, dataLen) or None. */
  private[graft] def riffWalk(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    def tag(off: Int) = new String(bytes.slice(off, off + 4), "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val sz = u32(off.toInt + 4)
      tag(off.toInt) match {
        case "fmt " => fmtOff = off.toInt
        case "data" => dataOff = off.toInt + 8; dataLen = sz
        case _ => ()
      }
      off += 8 + sz + (sz & 1)
    }
    if (fmtOff < 0 || dataOff < 0 || fmtOff + 24 > bytes.length) None
    else Some((fmtOff, dataOff, dataLen))
  }

  /** REAL sample decode for 16-bit PCM WAV — PCM is uncompressed, so
    * no codec is needed at all: walk to the "data" chunk and fold the
    * little-endian i16 samples into amplitude statistics. 8-dim
    * feature = [mean, rms, zeroCrossRate, min, max, durationSec,
    * loudRatio(|a|>0.5), channels], amplitudes normalized to [-1, 1].
    * Returns None for non-PCM / non-16-bit / missing-data-chunk bytes
    * (the hash stub covers those). */
  private[graft] def wavPcmFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    def u16(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL)) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    val (fmtOff, dataOff, dataLen) = riffWalk(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val audioFormat = u16(fmtOff + 8)
    val channels = u16(fmtOff + 10)
    val rate = u32(fmtOff + 12)
    val bits = u16(fmtOff + 22)
    if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0) return None
    val n = math.min(dataLen, (bytes.length - dataOff).toLong).toInt / 2
    if (n <= 0) return None
    var sum = 0.0; var sumSq = 0.0; var crossings = 0
    var mn = Double.MaxValue; var mx = Double.MinValue
    var loud = 0
    var prev = 0.0; var first = true
    var i = 0
    while (i < n) {
      val raw = ((bytes(dataOff + 2 * i) & 0xff) |
                 (bytes(dataOff + 2 * i + 1) << 8)).toShort
      val a = raw / 32768.0
      sum += a; sumSq += a * a
      if (a < mn) mn = a
      if (a > mx) mx = a
      if (math.abs(a) > 0.5) loud += 1
      if (!first && prev * a < 0) crossings += 1
      prev = a; first = false
      i += 1
    }
    val dur = n.toDouble / channels / rate
    Some(Array(
      (sum / n).toFloat, math.sqrt(sumSq / n).toFloat,
      (if (n > 1) crossings.toDouble / (n - 1) else 0.0).toFloat,
      mn.toFloat, mx.toFloat, dur.toFloat,
      (loud.toDouble / n).toFloat, channels.toFloat))
  }

  /** REAL pixel decode for PNG via the JDK-builtin `javax.imageio`
    * reader (no external codec dependency): 8-dim feature =
    * [meanR, meanG, meanB, meanA, meanLuma, stdLuma, minLuma, maxLuma]
    * with channels in [0,1] and Rec.601 luma. Returns None for bytes
    * ImageIO cannot decode (e.g. a header-only fixture with no IDAT),
    * letting the caller fall back to the hash stub. */
  private[graft] def pngPixelFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val ht = img.getHeight
        val argb = img.getRGB(0, 0, w, ht, null, 0, w)
        val n = argb.length.toDouble
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var sa = 0.0
        var sl = 0.0; var sl2 = 0.0
        var lmin = Double.MaxValue; var lmax = Double.MinValue
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          val a = ((p >>> 24) & 0xff) / 255.0
          val r = ((p >>> 16) & 0xff) / 255.0
          val g = ((p >>> 8) & 0xff) / 255.0
          val b = (p & 0xff) / 255.0
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sa += a; sl += l; sl2 += l * l
          if (l < lmin) lmin = l
          if (l > lmax) lmax = l
          i += 1
        }
        val meanL = sl / n
        val stdL = math.sqrt(math.max(0.0, sl2 / n - meanL * meanL))
        Some((w, ht, Array((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
                           (sa / n).toFloat, meanL.toFloat, stdL.toFloat,
                           lmin.toFloat, lmax.toFloat)))
      }
    } catch { case _: Exception => None }

  /** Decode stage: PNG pixels are decoded for REAL (JDK `ImageIO` —
    * mean-channel/luma-statistics feature vector), and 16-bit PCM WAV
    * samples are decoded for REAL too (PCM is uncompressed — no codec
    * needed; amplitude statistics via [[wavPcmFeatures]]). Only
    * compressed audio and opaque blobs remain a clearly-marked STUB
    * deriving deterministic pseudo-features from a SHA-256 of the
    * bytes. Swap the stub branch for a real codec (e.g. a JNI
    * decoder) in production. */
  /** JPEG magic: FF D8 FF (SOI + first marker byte). JPEG is COMPRESSED
    * but still JDK-decodable — `ImageIO` ships a JPEG reader — so it
    * rides the same real pixel path as PNG. */
  private[graft] def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte

  /** GIF87a/GIF89a magic; `ImageIO` ships a GIF reader (first frame),
    * so GIF rides the real pixel path too (r11 verdict #7 — free JDK
    * wins shrink the stub class). */
  private[graft] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 13 && {
      val m = new String(bytes.take(6), "US-ASCII")
      m == "GIF87a" || m == "GIF89a"
    }

  /** GIF logical-screen dims (LE u16 at offsets 6/8) — the header
    * fallback when the pixel decode fails on a truncated fixture. */
  private[graft] def gifDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (!isGif(bytes)) None
    else Some(((bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8),
               (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)))

  /** BMP "BM" magic + a KNOWN DIB-header size at offset 14 (the
    * 2-byte magic alone would misclassify any text starting "BM");
    * `ImageIO` ships a BMP reader, so BMP rides the real pixel path.
    * BITMAPCOREHEADER (size 12, u16 dims) is ancient and excluded —
    * only the i32-dim variants are accepted. */
  private[graft] def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 26 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte && {
      val dib = (bytes(14) & 0xff) | ((bytes(15) & 0xff) << 8) |
        ((bytes(16) & 0xff) << 16) | ((bytes(17) & 0xff) << 24)
      Set(40, 52, 56, 64, 108, 124).contains(dib)
    }

  /** BMP dims (LE i32 at 18/22; height may be negative for top-down
    * rows — report the magnitude). */
  private[graft] def bmpDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    if (!isBmp(bytes)) None else Some((i32(18), math.abs(i32(22))))
  }

  /** MPEG-1/2/2.5 Layer III (MP3) per-version bitrate (kbps) and
    * sample-rate tables — published header math (ISO 11172-3 /
    * 13818-3); a frame-header walk needs no codec, the same contract
    * as the WAV/MP4 metadata parses. */
  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RatesV1 = Array(44100, 48000, 32000)
  private val Mp3RatesV2 = Array(22050, 24000, 16000)
  private val Mp3RatesV25 = Array(11025, 12000, 8000)

  /** MP3 (Layer III) metadata from a frame-header walk: skips an ID3v2
    * tag (synchsafe size), requires ≥ 2 CONSECUTIVE valid frames (a
    * lone 0xFFE sync is too weak a signature), then walks frames by
    * the computed frame length, summing duration and averaging
    * bitrate. Returns (durationSec, sampleRate, channels, avgKbps,
    * nFrames); None for non-MP3 bytes. FRAME decode (hybrid filterbank,
    * Huffman) still needs a codec and stays behind the stub. */
  private[graft] def mp3Meta(bytes: Array[Byte])
      : Option[(Float, Int, Int, Int, Int)] = {
    var start = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      start = 10 + sz
    }
    // parse one frame header at `off`: (frameBytes, samples, rate,
    // kbps, channels), or null if invalid
    def frame(off: Int): Array[Int] = {
      if (off + 4 > bytes.length) return null
      if (bytes(off) != 0xFF.toByte ||
          (bytes(off + 1) & 0xE0) != 0xE0) return null
      val version = (bytes(off + 1) >> 3) & 3  // 0=2.5, 2=MPEG2, 3=MPEG1
      val layer = (bytes(off + 1) >> 1) & 3    // 1 = Layer III
      if (version == 1 || layer != 1) return null
      val brIdx = (bytes(off + 2) >> 4) & 0xf
      val srIdx = (bytes(off + 2) >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
      val pad = (bytes(off + 2) >> 1) & 1
      val mode = (bytes(off + 3) >> 6) & 3
      val v1 = version == 3
      val kbps = (if (v1) Mp3BitrateV1L3 else Mp3BitrateV2L3)(brIdx)
      val rate = (if (v1) Mp3RatesV1
                  else if (version == 2) Mp3RatesV2 else Mp3RatesV25)(srIdx)
      val samples = if (v1) 1152 else 576
      val len = samples / 8 * kbps * 1000 / rate + pad
      Array(len, samples, rate, kbps, if (mode == 3) 1 else 2)
    }
    if (start + 4 > bytes.length) return None
    val f0 = frame(start)
    if (f0 == null || frame(start + f0(0)) == null) return None
    var off = start
    var nFrames = 0
    var dur = 0.0
    var kbpsSum = 0L
    var done = false
    while (!done) {
      val f = frame(off)
      if (f == null || off + f(0) > bytes.length) done = true
      else {
        nFrames += 1
        dur += f(1).toDouble / f(2)
        kbpsSum += f(3)
        off += f(0)
      }
    }
    Some((dur.toFloat, f0(2), f0(4), (kbpsSum / nFrames).toInt, nFrames))
  }

  /** Real container parse for MP4 (ISO BMFF): boxes are
    * [u32 size][4cc type], with size==1 meaning a 64-bit largesize
    * follows the 4cc (common for big `mdat`) and size==0 meaning
    * box-to-EOF — both handled at the top level; `moov` children are
    * assumed plain-u32 (always true in practice for mvhd/trak).
    * Requires a leading `ftyp`, walks the
    * top-level list to `moov`, then `moov`'s children for `mvhd`
    * (version 0: timescale at +20, duration at +24 — giving duration
    * in seconds) and the `trak` count. A box walk needs no codec —
    * the same contract as the PNG/WAV header parses; FRAME decode
    * would need one and stays behind the stub. Returns
    * (durationSec, nTracks, timescale); None for non-MP4 bytes. */
  private[graft] def mp4Meta(bytes: Array[Byte]): Option[(Float, Int, Int)] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def tag(off: Int) = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
    if (bytes.length < 16 || tag(0) != "ftyp") return None
    // top-level box size: 1 → 64-bit largesize follows the 4cc (common
    // for big mdat); 0 → box extends to EOF; else the plain u32
    def boxSize(off: Int): Long = u32(off) match {
      case 1L =>
        if (off + 16 > bytes.length) -1L
        else (u32(off + 8) << 32) | u32(off + 12)
      case 0L => (bytes.length - off).toLong
      case sz => sz
    }
    var off = 0L
    var moovOff = -1; var moovEnd = -1
    while (off + 8 <= bytes.length && moovOff < 0) {
      val sz = boxSize(off.toInt)
      if (sz < 8) return None
      if (tag(off.toInt) == "moov") {
        moovOff = off.toInt
        moovEnd = math.min(off + sz, bytes.length.toLong).toInt
      }
      off += sz
    }
    if (moovOff < 0) return None
    // children start after the (extended, if largesize) moov header
    var o = moovOff + (if (u32(moovOff) == 1L) 16 else 8)
    var timescale = 0; var duration = 0L; var tracks = 0
    while (o + 8 <= moovEnd && o + 8 <= bytes.length) {
      val sz = u32(o).toInt
      if (sz < 8) return None
      tag(o) match {
        case "mvhd" if (bytes(o + 8) & 0xff) == 0 && o + 28 <= bytes.length =>
          timescale = u32(o + 20).toInt
          duration = u32(o + 24)
        case "trak" => tracks += 1
        case _ => ()
      }
      o += sz
    }
    if (timescale > 0) Some((duration.toFloat / timescale, tracks, timescale))
    else None
  }

  /** REAL frame decode for MJPEG-in-MP4: walks the top-level boxes
    * (largesize-aware, same contract as [[mp4Meta]]) to the `mdat`
    * payload(s), slices JPEG frames on their SOI/EOI markers — safe
    * framing because JPEG byte-stuffs FF in entropy data as FF 00, so
    * FF D9 only occurs as a true end-of-image — decodes each frame via
    * the JDK `ImageIO` JPEG reader, and aggregates per-frame Rec.601
    * mean-luma statistics. Returns (frameW, frameH,
    * [nFrames, avgLuma, stdLuma, minLuma, maxLuma, firstLuma,
    * lastLuma]); None when no decodable frame exists (genuinely
    * compressed codecs — H.264 etc. — stay behind the hash stub,
    * documented). */
  /** Byte ranges of the individual JPEG frames inside an MP4's `mdat`
    * payload(s) — the shared container walk behind [[mjpegFrames]]
    * (decode-all statistics) and [[sampleFrames]] (fixed-rate
    * sampling, which must be able to SKIP frames without paying their
    * decode). Walks the top-level boxes (largesize-aware, same
    * contract as [[mp4Meta]]; requires a leading `ftyp`), then slices
    * frames starting at each SOI via the marker-segment walk of
    * [[jpegEndOffset]] — byte stuffing (FF 00) protects only
    * entropy-coded data, so APPn/COM payloads (e.g. EXIF thumbnails
    * with their own EOI) must be length-skipped, not scanned. Falls
    * back to a raw FF D9 scan per frame only when the header doesn't
    * parse. Empty on any malformed container. */
  private[graft] def jpegFrameRanges(bytes: Array[Byte]): Seq[(Int, Int)] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def tag(off: Int) = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
    if (bytes.length < 16 || tag(0) != "ftyp") return Seq.empty
    var off = 0L
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (off + 8 <= bytes.length) {
      val (hdr, sz) = u32(off.toInt) match {
        case 1L =>
          if (off + 16 > bytes.length) (16, -1L)
          else (16, (u32(off.toInt + 8) << 32) | u32(off.toInt + 12))
        case 0L => (8, bytes.length - off)
        case s => (8, s)
      }
      if (sz < hdr) return Seq.empty
      if (tag(off.toInt) == "mdat")
        ranges += (((off + hdr).toInt,
                    math.min(off + sz, bytes.length.toLong).toInt))
      off += sz
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    ranges.foreach { case (s, e) =>
      var i = s
      while (i + 3 <= e) {
        if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
            bytes(i + 2) == 0xFF.toByte) {
          // Marker-segment walk first: byte stuffing protects only
          // entropy-coded data, so an EXIF APP1 payload may embed a
          // thumbnail JPEG with its own FF D9 — a raw EOI scan would
          // slice the frame short. Fall back to the raw scan only
          // when the segment walk can't parse the header.
          var end = jpegEndOffset(bytes, i, e)
          if (end < 0) {
            var j = i + 2
            while (end < 0 && j + 2 <= e) {
              if (bytes(j) == 0xFF.toByte && bytes(j + 1) == 0xD9.toByte)
                end = j + 2
              j += 1
            }
          }
          if (end > 0) { frames += ((i, end)); i = end }
          else i = e
        } else i += 1
      }
    }
    frames.toSeq
  }

  /** End offset (exclusive) of the JPEG starting at `start` (which
    * points at FF D8), found by walking marker segments with their
    * 2-byte big-endian length fields — APPn/COM payloads (EXIF
    * thumbnails included) are skipped wholesale, so an embedded EOI
    * can't end the frame early. Entropy-coded data after an SOS is
    * scanned byte-wise, honoring FF 00 stuffing and FF D0-D7 restart
    * markers; any other marker returns to the segment walk (covers
    * progressive multi-scan streams). Returns -1 when the structure
    * doesn't parse within `limit` (callers fall back to a raw EOI
    * scan). */
  private[graft] def jpegEndOffset(bytes: Array[Byte], start: Int,
                                   limit: Int): Int = {
    var p = start + 2
    var inEntropy = false
    while (p < limit) {
      if (!inEntropy) {
        if (bytes(p) != 0xFF.toByte) return -1
        // fill bytes: any run of FF before the marker id
        while (p + 1 < limit && bytes(p + 1) == 0xFF.toByte) p += 1
        if (p + 1 >= limit) return -1
        val m = bytes(p + 1) & 0xff
        p += 2
        if (m == 0xD9) return p // EOI
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) () // standalone
        else {
          if (p + 2 > limit) return -1
          val len = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
          if (len < 2 || p + len > limit) return -1
          p += len
          if (m == 0xDA) inEntropy = true // SOS → entropy-coded scan
        }
      } else {
        if (bytes(p) != 0xFF.toByte) p += 1
        else if (p + 1 >= limit) return -1
        else {
          val m = bytes(p + 1) & 0xff
          if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) p += 2 // stuffed / RST
          else if (m == 0xFF) p += 1 // fill byte
          else if (m == 0xD9) return p + 2 // EOI
          else inEntropy = false // next segment (progressive scan, DNL, …)
        }
      }
    }
    -1
  }

  private[graft] def mjpegFrames(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val lumas = scala.collection.mutable.ArrayBuffer.empty[Float]
    var w = 0; var h = 0
    jpegFrameRanges(bytes).foreach { case (s, e) =>
      pngPixelFeatures(java.util.Arrays.copyOfRange(bytes, s, e))
        .foreach { case (fw, fh, f) =>
          if (w == 0) { w = fw; h = fh }
          lumas += f(4) // meanLuma slot of the pixel feature
        }
    }
    if (lumas.isEmpty) None
    else {
      val n = lumas.length
      val mean = lumas.sum / n
      val std = math.sqrt(lumas.map(l => (l - mean) * (l - mean)).sum / n)
      Some((w, h, Array(n.toFloat, mean, std.toFloat,
                        lumas.min, lumas.max, lumas.head, lumas.last)))
    }
  }

  private def stubDecode(row: MediaRow): MediaFeatures = {
    val digest = MessageDigest.getInstance("SHA-256").digest(row.media)
    def b(i: Int): Int = digest(i) & 0xff
    val png = pngDims(row.media)
    val jpeg = png.isEmpty && isJpeg(row.media)
    val gif = if (png.isEmpty && !jpeg) gifDims(row.media) else None
    val bmp = if (png.isEmpty && !jpeg && gif.isEmpty) bmpDims(row.media)
              else None
    val isImage = png.isDefined || jpeg || gif.isDefined || bmp.isDefined
    val wav = if (!isImage) wavMeta(row.media) else None
    val mp4 = if (!isImage && wav.isEmpty) mp4Meta(row.media) else None
    val mp3 = if (!isImage && wav.isEmpty && mp4.isEmpty) mp3Meta(row.media)
              else None
    // MPEG-1 video elementary stream: REAL intra decode ([[Mpeg1]] —
    // the from-scratch ISO 11172-2 I-frame path, r9)
    val m1v = if (!isImage && wav.isEmpty && mp4.isEmpty && mp3.isEmpty &&
                  Mpeg1.isMpeg1Video(row.media))
                Mpeg1.mpeg1Features(row.media) else None
    val kind = if (png.isDefined) "png" else if (jpeg) "jpeg"
               else if (gif.isDefined) "gif"
               else if (bmp.isDefined) "bmp"
               else if (wav.isDefined) "wav"
               else if (mp4.isDefined) "mp4"
               else if (mp3.isDefined) "mp3"
               else if (m1v.isDefined) "mpeg1" else "opaque"
    // gif/bmp ride the same REAL ImageIO pixel path as png/jpeg
    val pixels = if (isImage) pngPixelFeatures(row.media) else None
    val samples = if (wav.isDefined) wavPcmFeatures(row.media) else None
    // video: MJPEG frames decode for real (ImageIO per keyframe);
    // genuinely compressed codecs fall through to the metadata path
    val frames = if (mp4.isDefined) mjpegFrames(row.media) else None
    // stub fallback for opaque bytes: pseudo-dims from the hash
    val (w, h) = pixels.map(p => (p._1, p._2)).orElse(png)
      .orElse(gif).orElse(bmp)
      .orElse(frames.map(f => (f._1, f._2)))
      .orElse(m1v.map(f => (f._1, f._2))).getOrElse(
      // undecodable jpeg/audio/video rows report honest zero dims
      if (wav.isDefined || mp4.isDefined || mp3.isDefined || jpeg) (0, 0)
      else (16 + (b(0) << 4 | b(1) >> 4), 16 + (b(2) << 4 | b(3) >> 4)))
    // mp4: tracks/timescale reuse the audio metadata slots (documented
    // in the case class — a track count is channel-like, the movie
    // timescale rate-like); duration rides in feat(0), frame-level
    // features stay behind the stub (frame decode needs a codec).
    // mp3: real (channels, sampleRate) from the frame-header walk.
    val (ch, sr) = wav.orElse(mp4.map(m => (m._2, m._3)))
      .orElse(mp3.map(m => (m._3, m._2))).getOrElse((0, 0))
    val stubFeat = Array.tabulate(8)(i => b(8 + i) / 255.0f)
    MediaFeatures(
      doc_id = row.doc_id,
      kind = kind,
      width = w,
      height = h,
      sample_rate = sr,
      channels = ch,
      n_bytes = row.media.length,
      feat = pixels.map(_._3).orElse(samples)
        // mp4 with decodable MJPEG frames: [duration, nFrames, avgLuma,
        // stdLuma, minLuma, maxLuma, firstLuma, lastLuma] — all real
        .orElse(frames.map { case (_, _, f) => mp4.get._1 +: f })
        .orElse(mp4.map(m => stubFeat.updated(0, m._1)))
        // mp3: [duration, avgKbps, nFrames, rate, channels, 0, 0, 0] —
        // all REAL header math; sample decode stays behind the stub
        .orElse(mp3.map(m => Array(m._1, m._4.toFloat, m._5.toFloat,
                                   m._2.toFloat, m._3.toFloat, 0f, 0f, 0f)))
        .orElse(m1v.map(_._3))
        .getOrElse(stubFeat))
  }

  /** Batched per-partition feature extraction. `batchSize` mirrors the
    * arrow-batch knob of a Pandas-UDF pipeline: the stub processes one
    * row at a time, but a real codec would amortize model/codec init
    * across each batch. */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: decode the whole batch against one codec instance
        batch.iterator.map(stubDecode)
      }
    }
  }

  // ---- resize (r12 — the decode/feature-extract/RESIZE/frame-sample
  //      quartet's missing member) ----

  /** One thumbnail row: source dims + the th×tw bilinear luma grid in
    * row-major order (doubles in [0,1]; empty for undecodable media,
    * kind "opaque"). */
  case class MediaThumb(doc_id: Long, kind: String, src_w: Int, src_h: Int,
                        thumb: Seq[Double])

  /** Deterministic 16×16 grayscale PNG for a doc_id — the corpus
    * stand-in the resize query round-trips: v(x, y) =
    * (doc_id·31 + y·16 + x) mod 256 in all three channels. Because the
    * pattern is ANALYTIC and PNG is lossless, the DuckDB oracle can
    * regenerate the expected pixels from doc_id alone — so the real
    * encode→decode→resize path gets an oracle-exact check without SQL
    * ever touching a zlib stream. */
  private[graft] def gradientPng(docId: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((docId * 31 + y.toLong * w + x) % 256) + 256) % 256
        img.setRGB(x, y, (v << 16 | v << 8 | v).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL bilinear grayscale resize of decoded image bytes (PNG / JPEG
    * / GIF / BMP via the JDK `ImageIO` reader): Rec.601 luma per source
    * pixel, then the standard half-pixel-center sampling
    * (sx = (tx+0.5)·w/tw − 0.5) with edge clamping. Every arithmetic
    * step is written in a fixed order so the analytic SQL oracle can
    * mirror it bit-for-bit. Returns None for bytes ImageIO cannot
    * decode. */
  private[graft] def resizeLuma(bytes: Array[Byte], tw: Int,
                                th: Int): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val lum = new Array[Double](argb.length)
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          val r = ((p >>> 16) & 0xff) / 255.0
          val g = ((p >>> 8) & 0xff) / 255.0
          val b = (p & 0xff) / 255.0
          lum(i) = 0.299 * r + 0.587 * g + 0.114 * b
          i += 1
        }
        val scaleX = w.toDouble / tw
        val scaleY = h.toDouble / th
        val out = new Array[Double](tw * th)
        var ty = 0
        while (ty < th) {
          // Fractions are computed from the CLAMPED source coordinate
          // (standard edge-clamp bilinear): when upscaling, sy/sx fall
          // outside [0, dim-1] at the borders, and the unclamped
          // fraction would blend the edge pixel toward its neighbor
          // with weight ≈1 instead of replicating it. Downscales
          // (every registered query) never leave the range, so the
          // clamp is a no-op there and the analytic oracle is
          // unaffected.
          val sy = math.min(math.max((ty + 0.5) * scaleY - 0.5, 0.0), (h - 1).toDouble)
          val y0 = math.floor(sy).toInt
          val y1 = math.min(y0 + 1, h - 1)
          val fy = sy - y0
          var tx = 0
          while (tx < tw) {
            val sx = math.min(math.max((tx + 0.5) * scaleX - 0.5, 0.0), (w - 1).toDouble)
            val x0 = math.floor(sx).toInt
            val x1 = math.min(x0 + 1, w - 1)
            val fx = sx - x0
            val top = lum(y0 * w + x0) * (1.0 - fx) + lum(y0 * w + x1) * fx
            val bot = lum(y1 * w + x0) * (1.0 - fx) + lum(y1 * w + x1) * fx
            out(ty * tw + tx) = top * (1.0 - fy) + bot * fy
            tx += 1
          }
          ty += 1
        }
        Some((w, h, out))
      }
    } catch { case _: Exception => None }

  /** Batched per-partition thumbnailing — the resize member of the
    * multimodal quartet, same Spark plumbing as [[decodeFeatures]]
    * (typed Dataset in/out, per-partition batches standing in for the
    * arrow-batch shape of a Pandas-UDF pipeline, no shuffle: resize is
    * embarrassingly parallel at any corpus size). */
  def thumbnails(ds: Dataset[MediaRow], tw: Int = 5, th: Int = 5,
                 batchSize: Int = 64): Dataset[MediaThumb] = {
    require(tw >= 1 && th >= 1, s"target dims must be >= 1, got ${tw}x$th")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          resizeLuma(row.media, tw, th) match {
            case Some((w, h, t)) =>
              MediaThumb(row.doc_id, "image", w, h, t.toSeq)
            case None =>
              MediaThumb(row.doc_id, "opaque", 0, 0, Seq.empty)
          }
        }
      }
    }
  }

  /** q_image_resize: the REAL encode→decode→resize round trip —
    * deterministic 16×16 gradient PNGs ([[gradientPng]]) are written
    * and re-read through the actual JDK PNG codec on the executors,
    * bilinear-resized to 5×5 ([[thumbnails]]), and emitted one luma
    * per row. PNG is lossless and the pattern analytic, so the oracle
    * regenerates the expected grid from doc_id in pure SQL — the
    * decode path is verified oracle-exact without DuckDB decoding
    * anything. */
  def qImageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pngUdf = udf((id: Long) => gradientPng(id))
    // widen (r16): the single-split fixture scan serialized PNG
    // encode+decode on one core; rows are independent downstream
    val media = Tables.widen(Tables.documents(spark, dir)
      .select(col("doc_id"))).select(col("doc_id"),
              pngUdf(col("doc_id")).as("media"),
              lit("image/png").as("mime"))
      .as[MediaRow]
    thumbnails(media, tw = 5, th = 5)
      .toDF()
      .select(col("doc_id"), col("src_w"), col("src_h"),
              posexplode(col("thumb")).as(Seq("pos", "luma")))
      .select(col("doc_id"), col("src_w"), col("src_h"), col("pos"),
              round(col("luma"), 6).as("luma"))
      .orderBy("doc_id", "pos")
  }

  /** From-scratch grayscale PNG using STORED (uncompressed) deflate
    * blocks — a REAL, ImageIO-decodable PNG whose byte length is
    * fully analytic (no encoder heuristics): 8-byte signature +
    * 25-byte IHDR chunk + IDAT of 12 + (2 zlib header + 5 stored-
    * block header + h·(w+1) raw filter-prefixed scanlines + 4 adler)
    * + 12-byte IEND = 68 + h·(w+1). Dims and pixels are doc_id
    * functions, so the whole object is SQL-regenerable metadata-wise
    * while every byte still passes through the real IHDR parse and
    * the real ImageIO inflate+decode. */
  private[graft] def storedPng(docId: Long): Array[Byte] = {
    val w = (4 + java.lang.Math.floorMod(docId, 8L)).toInt
    val h = (6 + java.lang.Math.floorMod(docId, 5L)).toInt
    val raw = new Array[Byte](h * (w + 1))
    var y = 0; var k = 0
    while (y < h) {
      raw(k) = 0; k += 1 // filter: None
      var x = 0
      while (x < w) {
        raw(k) = java.lang.Math
          .floorMod(docId * 31 + (y.toLong * w + x), 256L).toByte
        k += 1; x += 1
      }
      y += 1
    }
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte) // bit depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, none, none
      .array()
    val z = java.nio.ByteBuffer.allocate(2 + 5 + raw.length + 4)
    z.put(0x78.toByte).put(0x01.toByte) // zlib header
    z.put(1.toByte) // final stored block
    z.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(raw.length.toShort).putShort((~raw.length).toShort)
    z.order(java.nio.ByteOrder.BIG_ENDIAN).put(raw)
    val ad = new java.util.zip.Adler32(); ad.update(raw)
    z.putInt(ad.getValue.toInt)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.array()) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Minimal-but-real MP4 (ftyp + moov[mvhd v0 + n empty traks] +
    * mdat) whose metadata AND byte length are doc_id functions:
    * timescale 1000 + 100·(id%7), duration (2+id%9)·timescale ticks,
    * 1 + id%3 tracks, a zero payload of 10 + id%20 bytes (no JPEG
    * SOI, so the frame decoder correctly reports no frames). Length
    * = 16 + (40 + 8·tracks) + 8 + payload. */
  private[graft] def mp4MetaFixture(docId: Long): Array[Byte] = {
    def m(k: Long) = java.lang.Math.floorMod(docId, k).toInt
    val timescale = 1000 + 100 * m(7)
    val durTicks = (2 + m(9)) * timescale
    val ntrak = 1 + m(3)
    val payloadLen = 10 + m(20)
    val moovSize = 8 + 32 + 8 * ntrak
    val bb = java.nio.ByteBuffer
      .allocate(16 + moovSize + 8 + payloadLen)
    bb.putInt(16).put("ftypmjp2".getBytes("US-ASCII")).putInt(0)
    bb.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    bb.putInt(32).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(durTicks)
      .putInt(0) // pad to the declared 32
    (1 to ntrak).foreach { _ =>
      bb.putInt(8).put("trak".getBytes("US-ASCII"))
    }
    bb.putInt(8 + payloadLen).put("mdat".getBytes("US-ASCII"))
    // payloadLen zero bytes follow (ByteBuffer is zero-initialized)
    bb.array()
  }

  /** q_multimodal_features: the multimodal DISPATCH itself, oracle-
    * checked (r14 — this row was the last binary-decode exemption;
    * its image/audio/video members all have oracle-exact analytic-
    * fixture siblings, so the umbrella converts the same way). Four
    * real container families by doc_id % 4 — a stored-deflate PNG
    * ([[storedPng]]), a 16-bit PCM WAV ([[pcmWavFixture]]), a
    * moov/mvhd MP4 ([[mp4MetaFixture]]), and opaque text bytes — all
    * pushed through the REAL magic-byte dispatch + header parses of
    * [[decodeFeatures]]. Every registered column (kind, dims, rate,
    * channels, byte length) is an analytic doc_id function — for the
    * opaque member the pseudo-dims come from SHA-256, which the
    * oracle reproduces via DuckDB's sha256 — so the DISPATCH and the
    * header walks are what the compare verifies. The float feature
    * vector stays a library/golden concern ([[decodeFeatures]]
    * specs): float32→string rendering is JVM-specific, the one part
    * of this row no engine-independent oracle can pin. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixtureUdf = udf((id: Long) =>
      java.lang.Math.floorMod(id, 4L).toInt match {
        case 0 => storedPng(id)
        case 1 => pcmWavFixture(id)
        case _ => mp4MetaFixture(id)
      })
    val media = Tables.widen(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))
      .select(col("doc_id"),
              when(col("doc_id") % 4 === 3, encode(col("text"), "UTF-8"))
                .otherwise(fixtureUdf(col("doc_id"))).as("media"),
              when(col("doc_id") % 4 === 0, lit("image/png"))
                .when(col("doc_id") % 4 === 1, lit("audio/wav"))
                .when(col("doc_id") % 4 === 2, lit("video/mp4"))
                .otherwise(lit("text/plain")).as("mime"))
      .as[MediaRow]
    decodeFeatures(media)
      .toDF()
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
              col("sample_rate"), col("channels"), col("n_bytes"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Frame sampling (r13 — VERDICT r12 #3): the fourth member of the
  // multimodal quartet (decode / feature / resize / SAMPLE) as a
  // registered row, not just the mjpegFrames library path.
  // ------------------------------------------------------------------

  /** One sampled video frame: its index in the stream, the stream's
    * total frame count, and the frame's mean Rec.601 luma (double —
    * the float feature path would blur the 6-dp oracle contract). */
  case class FrameSample(doc_id: Long, frame_idx: Int, n_frames: Int,
                         luma: Double)

  /** Solid-gray `w`×`h` JPEG at lossless-in-practice quality 1.0.
    * Pre-verified on this JDK: ALL 256 gray levels round-trip the
    * codec bit-exactly for solid frames (a uniform block is pure DC —
    * quality-1.0 quantization preserves it; MultimodalSpec re-asserts
    * the sweep), which is what lets a LOSSY codec participate in an
    * analytic-oracle fixture the way lossless PNG does in
    * [[qImageResize]]. */
  private[graft] def solidJpeg(gray: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(out)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    // the cache stream only guarantees the tail bytes reach `bos` on
    // close (dispose() does not flush it) — without this a JDK whose
    // writer defers I/O would emit truncated JPEGs
    out.close()
    bos.toByteArray
  }

  /** Deterministic MJPEG-in-MP4 fixture: 4 + doc_id % 5 solid-gray
    * frames (gray_i = (doc_id·37 + i·71) mod 256) behind a real
    * `ftyp` + `mdat` container — every byte passes through the real
    * box walk, marker slicing and JDK JPEG decode, while the expected
    * lumas stay SQL-regenerable from doc_id (the [[qImageResize]]
    * analytic-fixture discipline). */
  private[graft] def mjpegFixture(docId: Long): Array[Byte] =
    mjpegFixture(docId, solidJpeg(_))

  /** [[mjpegFixture]] with a caller-supplied frame encoder — the
    * task-local form: the fixture's frame space is the 256 solid
    * grays, so a per-task gray→bytes cache caps the ImageIO encoder
    * (writer construction + compression) at 256 invocations per task
    * instead of one per frame (guide §4.5: heavyweight state once per
    * task). Byte-identical output: the cache key IS the only encoder
    * input. */
  private[graft] def mjpegFixture(docId: Long,
                                  frame: Int => Array[Byte]): Array[Byte] = {
    val n = (4 + java.lang.Math.floorMod(docId, 5L)).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val payload = new java.io.ByteArrayOutputStream()
    (0 until n).foreach { i =>
      val g = java.lang.Math.floorMod(docId * 37 + i * 71L, 256L).toInt
      payload.write(frame(g))
    }
    def u32be(v: Int): Array[Byte] = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    bos.write(u32be(16)); bos.write("ftypmjp2".getBytes("US-ASCII"))
    bos.write(u32be(0))
    val body = payload.toByteArray
    bos.write(u32be(8 + body.length)); bos.write("mdat".getBytes("US-ASCII"))
    bos.write(body)
    bos.toByteArray
  }

  /** Fixed-rate frame sampling over a video binary column — the
    * training-pipeline primitive that turns "a corpus of videos" into
    * "a corpus of frames" without decoding the frames it drops: the
    * container walk + SOI/EOI slicing ([[jpegFrameRanges]]) is a
    * cheap marker scan over the bytes; ONLY every `every`-th frame
    * pays the codec. Same Spark plumbing as [[decodeFeatures]] /
    * [[thumbnails]] (typed Dataset in/out, per-partition batches, no
    * shuffle — sampling is embarrassingly parallel at any corpus
    * size; the decode CPU scales with sampled frames, not stream
    * length). Luma is computed in DOUBLE (not the float feature
    * vector) so the 6-dp presentation rounding is decided by ~1e-15
    * accumulator error, nine orders inside the grid. */
  def sampleFrames(ds: Dataset[MediaRow], every: Int = 3,
                   batchSize: Int = 64): Dataset[FrameSample] = {
    require(every >= 1, s"sampling rate must be >= 1, got $every")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val ranges = jpegFrameRanges(row.media)
          val n = ranges.length
          ranges.iterator.zipWithIndex
            .filter { case (_, i) => i % every == 0 }
            .flatMap { case ((s, e), i) =>
              meanLumaDouble(java.util.Arrays.copyOfRange(row.media, s, e))
                .map(l => FrameSample(row.doc_id, i, n, l))
            }
        }
      }
    }
  }

  /** Mean Rec.601 luma of one encoded frame, in full double precision
    * (the [[pngPixelFeatures]] formula without the float truncation —
    * floats carry ~6e-8 error, a ~12% chance of crossing a 6-dp
    * rounding boundary per distinct value; doubles make the rounded
    * value deterministic). */
  private[graft] def meanLumaDouble(bytes: Array[Byte]): Option[Double] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        var sl = 0.0
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          val r = ((p >>> 16) & 0xff) / 255.0
          val g = ((p >>> 8) & 0xff) / 255.0
          val b = (p & 0xff) / 255.0
          sl += 0.299 * r + 0.587 * g + 0.114 * b
          i += 1
        }
        Some(sl / argb.length)
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // q_audio_stats (r13): audio joins image (q_image_resize) and video
  // (q_frame_sample) on the ORACLE-EXACT side of the multimodal
  // family — and raises the bar: 16-bit PCM is integer end to end, so
  // the whole row is INTEGER-exact, no FP anywhere.
  // ------------------------------------------------------------------

  /** Integer amplitude statistics of one decoded PCM stream. Raw i16
    * sample space throughout — n, min, max, sum, sum|s|, sign flips
    * are all integers, so the oracle compare is exact by construction
    * (no rounding discipline needed at all). */
  case class AudioStats(doc_id: Long, n_samples: Int, sample_rate: Int,
                        min_s: Int, max_s: Int, sum_s: Long, sum_abs: Long,
                        n_sign_flips: Int)

  /** The RIFF/WAVE walk of [[wavPcmFeatures]] factored to raw
    * samples: (sampleRate, interleaved i16 samples) for 16-bit PCM;
    * None for anything else (compressed audio stays behind the
    * documented stub). */
  private[graft] def pcmSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    def u16(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL)) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    val (fmtOff, dataOff, dataLen) = riffWalk(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val audioFormat = u16(fmtOff + 8)
    val channels = u16(fmtOff + 10)
    val rate = u32(fmtOff + 12).toInt
    val bits = u16(fmtOff + 22)
    if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0) return None
    val n = math.min(dataLen, (bytes.length - dataOff).toLong).toInt / 2
    if (n <= 0) return None
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(dataOff + 2 * i) & 0xff) |
                (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some((rate, out))
  }

  /** Deterministic 16-bit PCM mono WAV fixture: 200 + doc_id % 100
    * samples with s_i = ((doc_id·131 + i·17) mod 65536) − 32768 — the
    * full i16 range, SQL-regenerable from doc_id with pure integer
    * arithmetic. A real RIFF container: every byte passes through the
    * real chunk walk and i16 little-endian decode. */
  private[graft] def pcmWavFixture(docId: Long, rate: Int = 8000): Array[Byte] = {
    val n = (200 + java.lang.Math.floorMod(docId, 100L)).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(rate).putInt(rate * 2) // byte rate
    bb.putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((java.lang.Math.floorMod(docId * 131 + i * 17L, 65536L)
        - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Batched per-partition PCM statistics — the audio member of the
    * multimodal quartet's decode path, same Spark plumbing as
    * [[thumbnails]]/[[sampleFrames]] (typed Dataset in/out, no
    * shuffle; decode is embarrassingly parallel). Undecodable bytes
    * yield no row (the honest-empty contract of the sampler). */
  def audioStats(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          pcmSamples(row.media).map { case (rate, s) =>
            var mn = Int.MaxValue; var mx = Int.MinValue
            var sum = 0L; var sumAbs = 0L; var flips = 0
            var i = 0
            while (i < s.length) {
              val v = s(i).toInt
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v; sumAbs += math.abs(v).toLong
              if (i > 0 && v.toLong * s(i - 1) < 0) flips += 1
              i += 1
            }
            AudioStats(row.doc_id, s.length, rate, mn, mx, sum, sumAbs, flips)
          }
        }
      }
    }
  }

  /** q_audio_stats: the REAL encode→contain→decode round trip for
    * audio — deterministic PCM WAV fixtures ([[pcmWavFixture]]) are
    * built per doc on the executors, walked and decoded through the
    * real RIFF/i16 path ([[pcmSamples]]), and reduced to INTEGER
    * amplitude statistics. PCM is uncompressed and the pattern
    * analytic, so the oracle regenerates the identical integers from
    * doc_id in pure SQL — no rounding discipline needed anywhere. */
  def qAudioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wavUdf = udf((id: Long) => pcmWavFixture(id))
    // widen (r16): parallelize fixture PCM synthesis + RIFF decode
    val media = Tables.widen(Tables.documents(spark, dir)
      .select(col("doc_id"))).select(col("doc_id"),
              wavUdf(col("doc_id")).as("media"),
              lit("audio/wav").as("mime"))
      .as[MediaRow]
    audioStats(media).toDF().orderBy("doc_id")
  }

  /** q_frame_sample: the REAL encode→contain→slice→sample→decode
    * round trip — deterministic solid-gray MJPEG-in-MP4 fixtures
    * ([[mjpegFixture]]) are built per doc on the executors, every 3rd
    * frame is sampled ([[sampleFrames]]; skipped frames are sliced
    * but never decoded), and each sampled frame emits its mean luma.
    * Solid frames survive the quality-1.0 JPEG codec bit-exactly
    * (pre-verified for all 256 grays), so the oracle regenerates the
    * expected (frame_idx, luma) grid from doc_id in pure SQL — the
    * whole container/codec path is verified oracle-exact without
    * DuckDB decoding anything. */
  def qFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fixture construction via mapPartitions with a TASK-LOCAL
    // gray→JPEG cache (r16, guide §4.5): the per-row UDF paid a fresh
    // ImageIO writer + compression per frame (~6 encodes/doc); the
    // frame space is only the 256 solid grays, so each task now
    // encodes each gray once and copies bytes after. The cache lives
    // and dies with the task — nothing persists across runs — and the
    // produced container bytes are identical.
    val media = Tables.widen(Tables.documents(spark, dir)
      .select(col("doc_id"))).as[Long]
      .mapPartitions { it =>
        val cache = new java.util.HashMap[Int, Array[Byte]]()
        val frame = (g: Int) => {
          var b = cache.get(g)
          if (b == null) { b = solidJpeg(g); cache.put(g, b) }
          b
        }
        it.map(id => MediaRow(id, mjpegFixture(id, frame), "video/mp4"))
      }
    sampleFrames(media, every = 3)
      .toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
              round(col("luma"), 6).as("luma"))
      .orderBy("doc_id", "frame_idx")
  }
}
