package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Frame sampling (r13): the codec-exactness precondition of the
  * q_frame_sample analytic oracle, the slice-don't-decode sampling
  * semantics, and container malformation behavior.
  *
  * The oracle trick only works if a solid-gray frame survives the
  * LOSSY JPEG codec bit-exactly — a uniform block is pure DC and
  * quality-1.0 quantization preserves it, but that is a property of
  * THIS JDK's encoder tables, so the full 256-gray sweep is asserted
  * here rather than assumed (a JDK upgrade that breaks it fails this
  * spec, not the oracle gate). */
class FrameSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def analyticLuma(g: Int): Double = {
    val x = g / 255.0
    0.299 * x + 0.587 * x + 0.114 * x
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("all 256 solid grays survive the quality-1.0 JPEG codec: decoded mean luma ≡ analytic at 6 dp") {
    (0 to 255).foreach { g =>
      val l = Multimodal.meanLumaDouble(Multimodal.solidJpeg(g))
        .getOrElse(fail(s"gray $g failed to decode"))
      // decode exactness makes the only error the 64-term accumulator
      // (~1e-15); the 6-dp rounding must land on the analytic value
      assert(math.abs(l - analyticLuma(g)) < 1e-12, s"gray $g: $l")
      assert(round6(l) == round6(analyticLuma(g)), s"gray $g rounds off-grid")
    }
  }

  test("mjpegFixture: frame count, per-frame gray schedule, real container walk") {
    Seq(0L, 1L, 7L, 123L, 100003L).foreach { id =>
      val bytes = Multimodal.mjpegFixture(id)
      val ranges = Multimodal.jpegFrameRanges(bytes)
      assert(ranges.length == (4 + id % 5).toInt, s"doc $id")
      ranges.zipWithIndex.foreach { case ((s, e), i) =>
        val g = java.lang.Math.floorMod(id * 37 + i * 71L, 256L).toInt
        val l = Multimodal.meanLumaDouble(
          java.util.Arrays.copyOfRange(bytes, s, e)).get
        assert(round6(l) == round6(analyticLuma(g)), s"doc $id frame $i")
      }
    }
  }

  test("sampleFrames: fixed-rate indices only, n_frames carried, skipped frames never decoded") {
    val media = Seq(3L, 4L).map(id =>
      Multimodal.MediaRow(id, Multimodal.mjpegFixture(id), "video/mp4"))
      .toDS()
    val out = Multimodal.sampleFrames(media, every = 3).collect()
      .map(f => (f.doc_id, f.frame_idx, f.n_frames)).sorted
    // doc 3: 4+3%5 = 7 frames -> idx 0,3,6; doc 4: 4+4%5 = 8 -> 0,3,6
    assert(out.toSeq == Seq((3L, 0, 7), (3L, 3, 7), (3L, 6, 7),
                            (4L, 0, 8), (4L, 3, 8), (4L, 6, 8)))
    // every=1 decodes the full stream — the sampler is a strict
    // superset relation, same lumas at the shared indices
    val all = Multimodal.sampleFrames(media, every = 1).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.luma).toMap
    assert(all.size == 7 + 8)
    Multimodal.sampleFrames(media, every = 3).collect().foreach { f =>
      assert(all((f.doc_id, f.frame_idx)) == f.luma)
    }
  }

  test("audioStats: real RIFF walk + i16 decode reproduces the analytic integers exactly") {
    // the r13 audio row is INTEGER end to end — assert the full decode
    // path (not the SQL mirror) against an independent recomputation
    Seq(0L, 1L, 99L, 12345L).foreach { id =>
      val bytes = Multimodal.pcmWavFixture(id)
      val (rate, s) = Multimodal.pcmSamples(bytes)
        .getOrElse(fail(s"doc $id failed to decode"))
      assert(rate == 8000)
      val n = (200 + id % 100).toInt
      assert(s.length == n, s"doc $id")
      (0 until n).foreach { i =>
        val expect = (java.lang.Math.floorMod(id * 131 + i * 17L, 65536L)
          - 32768L).toShort
        assert(s(i) == expect, s"doc $id sample $i")
      }
    }
    val media = Seq(Multimodal.MediaRow(7L, Multimodal.pcmWavFixture(7L),
      "audio/wav")).toDS()
    val st = Multimodal.audioStats(media).collect().head
    val samples = Multimodal.pcmSamples(Multimodal.pcmWavFixture(7L)).get._2
    assert(st.n_samples == samples.length)
    assert(st.min_s == samples.map(_.toInt).min)
    assert(st.max_s == samples.map(_.toInt).max)
    assert(st.sum_s == samples.map(_.toLong).sum)
    assert(st.sum_abs == samples.map(v => math.abs(v.toLong)).sum)
    assert(st.n_sign_flips == samples.sliding(2)
      .count(p => p(0).toLong * p(1) < 0))
  }

  test("audioStats: non-PCM / malformed bytes yield no rows, not failures") {
    val junk = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3), "audio/wav"),
      Multimodal.MediaRow(2L, "RIFFxxxxWAVE".getBytes("US-ASCII"), "audio/wav"))
      .toDS()
    assert(Multimodal.audioStats(junk).count() == 0)
  }

  test("hostile RIFF chunk sizes (u32 near-max, zero-advance, overflow) yield None, not a hang or throw") {
    // A chunk size like 0xFFFFFFF8 truncated to Int advances the old
    // walk by 0 — infinite executor loop. The Long walk must exit.
    def wavWithChunk(sz: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")).putInt(sz.toInt) // hostile size
      bb.array()
    }
    Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x80000000L, 0x7FFFFFFFL).foreach { sz =>
      val b = wavWithChunk(sz)
      assert(Multimodal.pcmSamples(b).isEmpty, s"pcmSamples sz=$sz")
      assert(Multimodal.wavPcmFeatures(b).isEmpty, s"wavPcmFeatures sz=$sz")
      assert(Multimodal.wavMeta(b).isEmpty, s"wavMeta sz=$sz")
    }
    // fmt chunk present but truncated before its 24-byte field block
    val shortFmt = {
      val bb = java.nio.ByteBuffer.allocate(48)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(40)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("data".getBytes("US-ASCII")).putInt(4)
      bb.putInt(0)
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16) // claims 16, has 4
      bb.putInt(1)
      bb.array()
    }
    assert(Multimodal.pcmSamples(shortFmt).isEmpty)
    assert(Multimodal.wavPcmFeatures(shortFmt).isEmpty)
  }

  test("jpegEndOffset: EXIF APP1 payload with an embedded thumbnail EOI does not end the frame early") {
    // Minimal synthetic JPEG: SOI, APP1 whose payload contains a full
    // SOI..EOI thumbnail, SOS header, entropy bytes with a stuffed FF
    // and a restart marker, then the true EOI.
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def add(xs: Int*): Unit = xs.foreach(x => buf += x.toByte)
    add(0xFF, 0xD8) // SOI
    val thumb = Seq(0xFF, 0xD8, 0x11, 0x22, 0xFF, 0xD9) // embedded EOI!
    add(0xFF, 0xE1) // APP1
    val payload = Seq(0x45, 0x78, 0x69, 0x66, 0x00, 0x00) ++ thumb
    add((payload.length + 2) >> 8, (payload.length + 2) & 0xff)
    payload.foreach(b => buf += b.toByte)
    add(0xFF, 0xDA, 0x00, 0x04, 0x01, 0x02) // SOS, len=4, 2 hdr bytes
    add(0x10, 0xFF, 0x00, 0x20, 0xFF, 0xD0, 0x30) // entropy: stuffed FF + RST0
    add(0xFF, 0xD9) // true EOI
    val jpeg = buf.toArray
    val end = Multimodal.jpegEndOffset(jpeg, 0, jpeg.length)
    assert(end == jpeg.length,
      s"frame sliced at $end, expected ${jpeg.length} (embedded EOI honored?)")
    // And through the container path: one frame spanning the full JPEG.
    val mp4 = Array[Byte](0, 0, 0, 16) ++ "ftypmjp2".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++
      java.nio.ByteBuffer.allocate(8).putInt(8 + jpeg.length)
        .put("mdat".getBytes("US-ASCII")).array().take(8) ++ jpeg
    val ranges = Multimodal.jpegFrameRanges(mp4)
    assert(ranges == Seq((24, 24 + jpeg.length)), ranges.toString)
  }

  test("malformed containers yield empty samples, not failures") {
    val junk = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3), "video/mp4"),
      Multimodal.MediaRow(2L, Array.emptyByteArray, "video/mp4"),
      // ftyp present but a box length lies past the buffer
      Multimodal.MediaRow(3L,
        Array[Byte](0, 0, 0, 16) ++ "ftypmjp2".getBytes("US-ASCII") ++
          Array[Byte](0, 0, 0, 0, 0, 0, 0, 99) ++
          "mdat".getBytes("US-ASCII"), "video/mp4")
    ).toDS()
    assert(Multimodal.sampleFrames(junk).count() == 0)
  }

  test("thumbnails at production dims: 512×512 → 224×224 matches the analytic bilinear bit-for-bit") {
    // r13 (VERDICT r12 #7): the registered resize is a 5×5 luma; the
    // production shape is ImageNet-ish 224×224 — exercise the real
    // operator there and pin its arithmetic against an independent
    // replication of the clamped-bilinear formula
    val (sw, sh, tw, th) = (512, 512, 224, 224)
    val docId = 9L
    val media = Seq(Multimodal.MediaRow(
      docId, Multimodal.gradientPng(docId, sw, sh), "image/png")).toDS()
    val out = Multimodal.thumbnails(media, tw, th).collect()
    assert(out.length == 1 && out.head.kind == "image")
    assert(out.head.src_w == sw && out.head.thumb.length == tw * th)
    def lum(x: Int, y: Int): Double = {
      val v = (((docId * 31 + y.toLong * sw + x) % 256) + 256) % 256
      val c = v / 255.0
      0.299 * c + 0.587 * c + 0.114 * c
    }
    def expected(tx: Int, ty: Int): Double = {
      val sx = math.min(math.max((tx + 0.5) * (sw.toDouble / tw) - 0.5, 0.0),
                        (sw - 1).toDouble)
      val sy = math.min(math.max((ty + 0.5) * (sh.toDouble / th) - 0.5, 0.0),
                        (sh - 1).toDouble)
      val x0 = math.floor(sx).toInt; val x1 = math.min(x0 + 1, sw - 1)
      val y0 = math.floor(sy).toInt; val y1 = math.min(y0 + 1, sh - 1)
      val fx = sx - x0; val fy = sy - y0
      val top = lum(x0, y0) * (1.0 - fx) + lum(x1, y0) * fx
      val bot = lum(x0, y1) * (1.0 - fx) + lum(x1, y1) * fx
      top * (1.0 - fy) + bot * fy
    }
    val t = out.head.thumb
    Seq((0, 0), (223, 0), (0, 223), (223, 223), (112, 112), (17, 201))
      .foreach { case (tx, ty) =>
        assert(t(ty * tw + tx) == expected(tx, ty), s"($tx,$ty)")
      }
  }

  test("upscale edge clamp: corners replicate the source pixel (r13 fraction fix)") {
    // 2×2 → 5×5: target corners fall OUTSIDE the source grid; the
    // clamped fraction must replicate the corner pixel, not blend it
    // toward its neighbor with weight ≈ 0.7 (the pre-r13 behavior)
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFFFFFF); img.setRGB(1, 0, 0)
    img.setRGB(0, 1, 0); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, t) = Multimodal.resizeLuma(bos.toByteArray, 5, 5).get
    val white = 0.299 * 1.0 + 0.587 * 1.0 + 0.114 * 1.0 // FP sum, not 1.0
    assert(t(0) == white, s"top-left ${t(0)}")     // white corner stays white
    assert(t(4) == 0.0, s"top-right ${t(4)}")      // black corner stays black
    assert(t(20) == 0.0 && t(24) == white)
  }

  test("jpegFrameRanges refactor keeps mjpegFrames' framing (shared walk)") {
    val bytes = Multimodal.mjpegFixture(42L)
    val viaStats = Multimodal.mjpegFrames(bytes).get
    assert(viaStats._3(0) == Multimodal.jpegFrameRanges(bytes).length.toFloat)
  }
}
