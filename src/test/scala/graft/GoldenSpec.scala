package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAggregator
import graft.ops.{Dedup, Multimodal, Similarity}

/** Golden tests for the oracle-exempt queries (SURVEY.md §5.2.2) and
  * the extension-point cross-checks. */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q_agg_approx: HLL estimate within 10% of exact per group") {
    val approx = Queries.all("q_agg_approx")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = Queries.all("q_agg_distinct")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    exact.foreach { case (flag, parts, supps) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - parts).toDouble / parts < 0.10, s"$flag parts: $ap vs $parts")
      assert(math.abs(as_ - supps).toDouble / supps < 0.10, s"$flag supps: $as_ vs $supps")
    }
  }

  test("q_percentiles_approx: GK summaries within 1% of the exact percentiles") {
    val approx = Queries.all("q_percentiles_approx")(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // exact counterpart: p25/median/p90 of l_extendedprice per flag
    val exact = Queries.all("q_percentiles")(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    exact.foreach { case (flag, es) =>
      approx(flag).zip(es).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.01, s"$flag: approx $a vs exact $e")
      }
    }
  }

  test("q_map_funcs: map round-trips keys and values") {
    val rows = Queries.all("q_map_funcs")(spark, TestSpark.sf0001).limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == "toks|chars")
      assert(r.getString(2) == s"${r.getLong(3)}|${r.getLong(4)}")
    }
  }

  /** Planted near-duplicates: base docs + copies with one token changed
    * (+ optionally an exact duplicate of doc 0 as id 999999). */
  private def plantedDir(withExactDup: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft_planted").toString
    val base = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") < 40).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dups = base.take(10).map { case (id, text, lang) =>
      val toks = text.trim.split("\\s+")
      (id + 100000L, (toks.dropRight(1) :+ "zzzz").mkString(" "), lang)
    }
    val exact =
      if (withExactDup) base.take(1).map { case (_, t, l) => (999999L, t, l) }
      else Array.empty[(Long, String, String)]
    val all = (base ++ dups ++ exact).toSeq
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")))
    all.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_dedup_near: finds every planted near-duplicate, all pairs >= tau") {
    val dir = plantedDir()
    val pairs = Dedup.qDedupNear(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // all reported pairs meet the threshold
    pairs.foreach { case (_, _, j) => assert(j >= 0.8) }
    // every planted (id, id+100000) pair is recalled (their 3-shingle
    // sets differ in only ~2 of ~n shingles => J well above 0.8 for
    // 40+-token docs; LSH candidate probability ~1)
    val planted = pairs.filter { case (a, b, _) => b == a + 100000L }.map(_._1).toSet
    val expected = Tables.documents(spark, dir)
      .filter(col("doc_id") >= 100000L).collect()
      .map(_.getLong(0) - 100000L)
      // only docs long enough that one changed token keeps J >= 0.8
      .filter { id =>
        val t = Tables.docTokens(spark, dir).filter(col("doc_id") === id)
          .select(size(col("toks"))).first().getInt(0)
        t >= 30
      }.toSet
    assert(expected.subsetOf(planted), s"missed: ${expected -- planted}")
  }

  test("q_dedup_simhash: identical docs collide at hamming 0") {
    val dir = plantedDir(withExactDup = true)
    val pairs = Dedup.qDedupSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 999999L && h == 0 })
  }

  test("MinHashAggregator == expression-based signature") {
    val mh = udaf(
      new MinHashAggregator(Dedup.MinhashK, Dedup.permA, Dedup.permB,
                            Dedup.MersennePrime),
      org.apache.spark.sql.Encoders.scalaLong)
    val docs = Tables.docTokens(spark, TestSpark.sf0001).limit(30)
      .select(col("doc_id"), Dedup.shingleHashes(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
    val viaExpr = docs.select(col("doc_id"), Dedup.minhashSig(col("sh")).as("sig"))
    val viaUdaf = docs
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy("doc_id").agg(mh(col("h")).as("sig"))
    val e = viaExpr.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val u = viaUdaf.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(e == u)
  }

  test("ShingleHashes: the three hash modes keep their contracts (raw md5 / mod prime / FNV)") {
    // r13: the span-depth sf1 regression came from putting an
    // IDENTITY consumer on the MinHash 2^31-1 universe — pin the mode
    // semantics so the next consumer picks by contract, not by copy:
    //  prime>0 ≡ (prime=0 raw md5 low64) mod prime, and FNV is a
    //  different (full-64-bit, non-md5) family
    import graft.functions.SetFunctions
    import graft.ops.Dedup
    SetFunctions.register(spark, Dedup.permA, Dedup.permB, Dedup.MersennePrime)
    val toks = Seq((1L, Seq("alpha", "beta", "gamma", "delta", "eps")))
      .toDF("doc_id", "toks")
    def mode(p: Long): Seq[Long] = toks
      .select(explode(SetFunctions.shingleHashes(col("toks"), 3, p)).as("h"))
      .collect().map(_.getLong(0)).toSeq.sorted
    val raw = mode(0L)
    val modded = mode(Dedup.MersennePrime)
    val fnv = mode(-1L)
    assert(raw.size == 3 && modded.size == 3 && fnv.size == 3)
    assert(raw.map(h => java.lang.Long.remainderUnsigned(h, Dedup.MersennePrime))
      .sorted == modded)
    // raw values live in the full 64-bit space (this fixture's md5
    // low64s are far above the 2^31-1 universe — the property the
    // span-identity consumer depends on)
    assert(raw.exists(h => h < 0 || h > Dedup.MersennePrime))
    assert(fnv != raw, "FNV and md5 must be distinct families")
    // and the raw mode matches an independent MessageDigest of the
    // joined shingle string
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
    var h = 0L
    (0 until 8).foreach(k => h |= (dig(8 + k) & 0xffL) << (8 * k))
    assert(raw.contains(h))
  }

  test("TopKPairs native aggregate == typed TopKAggregator UDAF") {
    import graft.functions.{TopKAggregator, TopKFunctions}
    TopKFunctions.register(spark)
    val topkUdaf = udaf(new TopKAggregator(3, distinct = true),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    // scored pairs with ties and exact duplicates (the LSH stream shape)
    val pairs = (1 to 2000).flatMap { i =>
      val g = i % 7
      Seq((g.toLong, (i % 13) / 13.0, (i % 31).toLong),
          (g.toLong, (i % 13) / 13.0, (i % 31).toLong)) // exact duplicate
    }.toDF("id_a", "cos_sim", "id_b")
    val native = pairs.groupBy("id_a")
      .agg(TopKFunctions.topk(col("cos_sim"), col("id_b"), 3, true).as("top"))
      .select(col("id_a"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("id_a"), col("pos"), col("p.score"), col("p.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val viaUdaf = pairs.groupBy("id_a")
      .agg(topkUdaf(col("cos_sim"), col("id_b")).as("top"))
      .select(col("id_a"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("id_a"), col("pos"), col("p._1"), col("p._2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(native.sorted.toSeq == viaUdaf.sorted.toSeq)
    assert(native.nonEmpty)
  }

  test("q_ann_ivf: structural properties vs exact knn") {
    val ann = Similarity.qAnnIvf(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val knn = Similarity.qKnn(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every query vector reports exactly 3 neighbours
    assert(ann.groupBy(_._1).forall(_._2.length == 3))
    // reported scores are the true pair scores (spot-check via knn overlap)
    val knnScores = knn.map(t => (t._1, t._3) -> t._4).toMap
    ann.foreach { case (a, _, b, s) =>
      knnScores.get((a, b)).foreach(exact => assert(exact == s)) }
    // recall floor: 8 OR-amplified tables with 3-flip multiprobe
    // (the r9 AnnTune retune) measure 0.95 at sf0.1 and higher here
    // (fewer buckets per table at this n), so 0.85 is the CI floor —
    // a recall regression (plane seeding, probe selection, top-k dedup)
    // fails here rather than shipping
    val kset = knn.map(t => (t._1, t._3)).toSet
    val aset = ann.map(t => (t._1, t._3)).toSet
    val recall = (kset & aset).size.toDouble / kset.size
    assert(recall >= 0.85, s"recall@3 = $recall")
  }

  test("q_multimodal_features: deterministic dispatch, one real container family per cohort") {
    val a = Multimodal.qMultimodalFeatures(spark, TestSpark.sf0001).collect()
    val b = Multimodal.qMultimodalFeatures(spark, TestSpark.sf0001).collect()
    assert(a.length == 500)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // the dispatch routes each cohort to its real header parse: kinds
    // are exactly the doc_id % 4 schedule (text bytes classify opaque:
    // valid UTF-8 never matches the multi-byte container magics)
    a.foreach { r =>
      val want = (r.getLong(0) % 4) match {
        case 0 => "png"; case 1 => "wav"; case 2 => "mp4"; case _ => "opaque"
      }
      assert(r.getString(1) == want, s"doc ${r.getLong(0)}")
      assert(r.getInt(6) > 0, "n_bytes")
    }
    // the png member's dims come from the REAL ImageIO decode of the
    // stored-deflate fixture (not just the IHDR header walk)
    val png = Multimodal.storedPng(8L) // w = 4+8%8 = 4, h = 6+8%5 = 9
    assert(png.length == 68 + 9 * (4 + 1), "analytic length")
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 4 && img.getHeight == 9)
    // pixel (x=2, y=3) gray = (8*31 + 3*4 + 2) % 256 = 6 — read the
    // RAW raster sample (getRGB would pass linear gray through the
    // CS_GRAY→sRGB conversion and report 42)
    assert(img.getRaster.getSample(2, 3, 0) == (8 * 31 + 3 * 4 + 2) % 256)
  }

  test("thumbnails: bilinear resize matches the analytic grid; edge cases") {
    val spark0 = spark
    import spark0.implicits._
    // the gradient fixture round-trips the REAL PNG codec; the expected
    // 5x5 grid is recomputed here with independent straightforward code
    val rows = Seq(Multimodal.MediaRow(7L, Multimodal.gradientPng(7L), "image/png"))
    val out = Multimodal.thumbnails(rows.toDS(), 5, 5).collect().head
    assert(out.kind == "image" && out.src_w == 16 && out.src_h == 16)
    assert(out.thumb.length == 25)
    def v(x: Int, y: Int) = ((7L * 31 + y * 16 + x) % 256).toDouble
    def lum(x: Int, y: Int) = { val c = v(x, y) / 255.0; 0.299 * c + 0.587 * c + 0.114 * c }
    for (ty <- 0 until 5; tx <- 0 until 5) {
      val sx = (tx + 0.5) * 3.2 - 0.5; val sy = (ty + 0.5) * 3.2 - 0.5
      val x0 = math.floor(sx).toInt; val y0 = math.floor(sy).toInt
      val fx = sx - x0; val fy = sy - y0
      val x1 = math.min(x0 + 1, 15); val y1 = math.min(y0 + 1, 15)
      val exp = (lum(x0, y0) * (1 - fx) + lum(x1, y0) * fx) * (1 - fy) +
                (lum(x0, y1) * (1 - fx) + lum(x1, y1) * fx) * fy
      assert(math.abs(out.thumb(ty * 5 + tx) - exp) < 1e-12,
             s"($tx,$ty): ${out.thumb(ty * 5 + tx)} vs $exp")
    }
    // 1x1 source: every target pixel clamps to the single source pixel
    val one = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    one.setRGB(0, 0, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(one, "png", bos)
    val t1 = Multimodal.thumbnails(
      Seq(Multimodal.MediaRow(1L, bos.toByteArray, "image/png")).toDS(), 3, 3)
      .collect().head
    assert(t1.thumb.distinct.length == 1 && t1.src_w == 1)
    // undecodable bytes: honest opaque row, empty thumb
    val op = Multimodal.thumbnails(
      Seq(Multimodal.MediaRow(2L, "not an image".getBytes, "text/plain")).toDS(), 3, 3)
      .collect().head
    assert(op.kind == "opaque" && op.thumb.isEmpty)
  }

  test("gif and bmp ride the real ImageIO pixel path (r11 verdict #7)") {
    val spark0 = spark
    import spark0.implicits._
    // a real 3x2 SOLID image written by the JDK's own GIF/BMP encoders
    // (solid color: any palette/quantization preserves it exactly)
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3; y <- 0 until 2) img.setRGB(x, y, 0xFF8040)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(Multimodal.MediaRow(1L, enc("gif"), "image/gif"),
                   Multimodal.MediaRow(2L, enc("bmp"), "image/bmp"))
    val out = Multimodal.decodeFeatures(rows.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    for ((id, kind) <- Seq(1L -> "gif", 2L -> "bmp")) {
      val f = out(id)
      assert(f.kind == kind, f.toString)
      assert(f.width == 3 && f.height == 2, f.toString)
      // solid 0xFF8040: meanR 1.0, meanG 128/255, meanB 64/255 — REAL
      // pixels, not a hash stub; uniform image has zero luma spread
      assert(math.abs(f.feat(0) - 1.0f) < 1e-3, f.feat.mkString(","))
      assert(math.abs(f.feat(1) - 128f / 255f) < 1e-3, f.feat.mkString(","))
      assert(math.abs(f.feat(2) - 64f / 255f) < 1e-3, f.feat.mkString(","))
      assert(f.feat(5) < 1e-6 && f.feat(6) == f.feat(7))
    }
    // header-dims fallback: magic present but pixels truncated
    assert(Multimodal.gifDims(enc("gif").take(13)).contains((3, 2)))
    assert(Multimodal.bmpDims(enc("bmp").take(26)).contains((3, 2)))
  }

  test("mp3Meta: duration/rate/bitrate from a crafted Layer III frame walk") {
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, joint stereo, no padding:
    // header FF FB 90 40; frame length = 144*128000/44100 = 417 bytes
    val frame = new Array[Byte](417)
    frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte
    frame(2) = 0x90.toByte; frame(3) = 0x40.toByte
    val three = frame ++ frame ++ frame
    val meta = Multimodal.mp3Meta(three)
    assert(meta.isDefined, "3-frame mp3 not recognized")
    val (dur, rate, ch, kbps, n) = meta.get
    assert(rate == 44100 && ch == 2 && kbps == 128 && n == 3)
    assert(math.abs(dur - 3 * 1152.0 / 44100) < 1e-5, dur.toString)
    // ID3v2-prefixed stream: synchsafe size skip lands on the sync
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10)
    assert(Multimodal.mp3Meta(id3 ++ three).map(_._5).contains(3))
    // a lone false sync (one valid header, garbage after) is rejected
    assert(Multimodal.mp3Meta(frame.take(4) ++ Array.fill(413)(0x41.toByte)
      ++ Array.fill(40)(0x41.toByte)).isEmpty)
    // end-to-end classification through the decode stage
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(9L, three, "audio/mpeg")).toDS()).collect().head
    assert(out.kind == "mp3" && out.sample_rate == 44100 && out.channels == 2)
    assert(out.feat(1) == 128.0f && out.feat(2) == 3.0f)
  }

  test("mp4Meta: duration/tracks/timescale from a crafted ISO-BMFF box walk") {
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ tag.getBytes("US-ASCII") ++ payload
    // mvhd v0: version+flags, ctime, mtime, timescale=1000, duration=5000
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(5000))
    val moov = box("moov", mvhd ++ box("trak", Array.empty) ++ box("trak", Array.empty))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0)) ++ moov
    assert(Multimodal.mp4Meta(mp4).contains((5.0f, 2, 1000)))
    assert(Multimodal.mp4Meta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(mp4.take(10)).isEmpty)
    // end-to-end: the decode stage classifies and carries the metadata
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(1L, mp4, "video/mp4")).toDS()).collect().head
    assert(out.kind == "mp4" && out.channels == 2 && out.sample_rate == 1000)
    assert(math.abs(out.feat(0) - 5.0f) < 1e-6)
  }

  test("mjpeg-in-mp4: REAL per-frame luma features, not hash pseudo-features") {
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ tag.getBytes("US-ASCII") ++ payload
    def jpegFrame(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // 3 MJPEG keyframes: black, mid-gray, white
    val mdat = box("mdat",
      jpegFrame(0x000000) ++ jpegFrame(0x808080) ++ jpegFrame(0xFFFFFF))
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(3000))
    val moov = box("moov", mvhd ++ box("trak", Array.empty))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0)) ++ moov ++ mdat
    val spark0 = spark
    import spark0.implicits._
    val out = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(9L, mp4, "video/mp4")).toDS()).collect().head
    assert(out.kind == "mp4")
    assert(out.width == 8 && out.height == 8) // real frame dims
    val f = out.feat
    assert(math.abs(f(0) - 3.0f) < 1e-6, "duration 3000/1000 s")
    assert(f(1) == 3.0f, "three decoded frames")
    // luma statistics must reflect the actual pixel content (JPEG is
    // lossy — wide-but-real tolerances): black ≈ 0, white ≈ 1, the
    // gray frame in between, monotone first→last
    assert(f(6) < 0.1f, s"first-frame luma ${f(6)} should be ~black")
    assert(f(7) > 0.9f, s"last-frame luma ${f(7)} should be ~white")
    assert(f(2) > 0.3f && f(2) < 0.7f, s"avg luma ${f(2)}")
    assert(f(4) == f(6) && f(5) == f(7), "min/max == black/white frames")
    assert(f(3) > 0.1f, "luma std spans the black-to-white range")
  }

  test("pngDims: real IHDR width/height from crafted PNG header bytes") {
    // 8-byte signature + IHDR chunk (len=13, tag, w=640, h=480, ...)
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(640) ++ be32(480) ++
        Array[Byte](8, 6, 0, 0, 0)
    assert(Multimodal.pngDims(png).contains((640, 480)))
    assert(Multimodal.pngDims("not a png".getBytes).isEmpty)
    assert(Multimodal.pngDims(png.take(20)).isEmpty)
  }

  test("wavMeta: channels/sample-rate from crafted RIFF header bytes") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
                             ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val wav: Array[Byte] =
      "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
        // a JUNK chunk first: the parser must walk the chunk list
        "JUNK".getBytes ++ le32(4) ++ Array[Byte](0, 0, 0, 0) ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
        le32(176400) ++ le16(4) ++ le16(16)
    assert(Multimodal.wavMeta(wav).contains((2, 44100)))
    assert(Multimodal.wavMeta("RIFFxxxxNOPE".getBytes ++ new Array[Byte](30)).isEmpty)
    assert(Multimodal.wavMeta(Array[Byte](1, 2, 3)).isEmpty)

    // end-to-end through the batched decode stage: mixed modalities in
    // one Dataset, each row classified + parsed from its own header
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(320) ++ be32(200) ++
        Array[Byte](8, 6, 0, 0, 0)
    val rows = Multimodal.decodeFeatures(Seq(
        Multimodal.MediaRow(1L, png, "image/png"),
        Multimodal.MediaRow(2L, wav, "audio/wav"),
        Multimodal.MediaRow(3L, "plain text".getBytes, "text/plain")).toDS())
      .collect().map(f => f.doc_id -> f).toMap
    assert(rows(1L).kind == "png" && rows(1L).width == 320 && rows(1L).height == 200)
    assert(rows(2L).kind == "wav" && rows(2L).channels == 2 && rows(2L).sample_rate == 44100)
    assert(rows(3L).kind == "opaque" && rows(3L).width > 0)
  }

  test("pngPixelFeatures: real pixel statistics from a crafted 2x2 PNG") {
    // red, green, blue, white — known channel means and luma stats
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 0xffff0000)
    img.setRGB(1, 0, 0xff00ff00)
    img.setRGB(0, 1, 0xff0000ff)
    img.setRGB(1, 1, 0xffffffff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray

    // end-to-end through the batched decode stage
    val rows = Multimodal.decodeFeatures(
        Seq(Multimodal.MediaRow(7L, png, "image/png")).toDS())
      .collect().map(f => f.doc_id -> f).toMap
    val f = rows(7L)
    assert(f.kind == "png" && f.width == 2 && f.height == 2)
    val lumas = Seq(0.299, 0.587, 0.114, 1.0)
    val meanL = lumas.sum / 4
    val stdL = math.sqrt(lumas.map(l => (l - meanL) * (l - meanL)).sum / 4)
    val expected = Seq(0.5, 0.5, 0.5, 1.0, meanL, stdL, 0.114, 1.0)
    f.feat.toSeq.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-3, s"feat ${f.feat.toSeq} vs $expected")
    }
    // undecodable header-only PNG bytes fall back to the hash stub
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val headerOnly: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
        Array[Byte](8, 6, 0, 0, 0)
    assert(Multimodal.pngPixelFeatures(headerOnly).isEmpty)
  }

  test("jpeg rides the real ImageIO pixel path (lossy-tolerant statistics)") {
    // uniform mid-gray: JPEG's DCT reproduces a flat field almost
    // exactly, so wide tolerances still pin real decoding
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, 0xff808080)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val jpeg = baos.toByteArray
    assert(Multimodal.isJpeg(jpeg))

    val rows = Multimodal.decodeFeatures(
        Seq(Multimodal.MediaRow(9L, jpeg, "image/jpeg")).toDS())
      .collect().map(f => f.doc_id -> f).toMap
    val f = rows(9L)
    assert(f.kind == "jpeg" && f.width == 8 && f.height == 8)
    val gray = 0x80 / 255.0
    // meanR/G/B and meanLuma near gray, stdLuma near 0
    Seq(0, 1, 2, 4).foreach(i =>
      assert(math.abs(f.feat(i) - gray) < 0.02, s"feat ${f.feat.toSeq}"))
    assert(f.feat(5) < 0.02, s"stdLuma ${f.feat(5)}")
    // truncated jpeg bytes: still classified jpeg, honest zero dims
    val broken = Multimodal.decodeFeatures(
        Seq(Multimodal.MediaRow(10L, jpeg.take(6), "image/jpeg")).toDS())
      .collect().head
    assert(broken.kind == "jpeg" && broken.width == 0 && broken.height == 0)
  }

  test("wavPcmFeatures: real amplitude statistics from crafted 16-bit PCM samples") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
                             ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // mono 8 kHz, samples [0.5, -0.5, 0.5, -0.5] (16384/-16384)
    val samples = Seq(16384, -16384, 16384, -16384)
    val data = samples.flatMap(le16).toArray
    val wav: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(data.length) ++ data
    val f = Multimodal.wavPcmFeatures(wav).get
    val expected = Seq(0.0, 0.5, 1.0, -0.5, 0.5, 4.0 / 8000, 0.0, 1.0)
    f.toSeq.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4, s"feat ${f.toSeq} vs $expected")
    }
    // end-to-end: the decode stage now reports real features for kind=wav
    val rows = Multimodal.decodeFeatures(
        Seq(Multimodal.MediaRow(11L, wav, "audio/wav")).toDS()).collect()
    assert(rows.head.kind == "wav" && rows.head.channels == 1 &&
           rows.head.sample_rate == 8000 &&
           math.abs(rows.head.feat(1) - 0.5f) < 1e-4)
    // non-PCM (compressed) audio still falls back to the stub
    val nonPcm: Array[Byte] =
      "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(85) ++ le16(2) ++ le32(44100) ++
        le32(176400) ++ le16(4) ++ le16(16) ++
        "data".getBytes ++ le32(4) ++ Array[Byte](0, 0, 0, 0)
    assert(Multimodal.wavPcmFeatures(nonPcm).isEmpty)
  }

  test("count-min sketch: estimates bound exact token counts (mergeable sketch path)") {
    val toks = Tables.docTokens(spark, TestSpark.sf0001)
      .select(explode(col("toks")).as("w"))
    val eps = 0.001
    val bytes = toks
      .agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)").as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val n = toks.count()
    val exact = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(20).collect()
    exact.foreach { r =>
      val est = cms.estimateCount(r.getString(0))
      // CMS never under-counts; over-count bounded by eps*N (w.h.p.)
      assert(est >= r.getLong(1),
             s"${r.getString(0)}: est $est < exact ${r.getLong(1)}")
      assert(est <= r.getLong(1) + (eps * n).toLong + 1,
             s"${r.getString(0)}: est $est vs exact ${r.getLong(1)} (N=$n)")
    }
  }

  test("GraftFunctions.registerAll: whole function surface callable from plain SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))")
      .head.getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT graft_sorted_intersect_size(array(1L,2L,5L), array(2L,3L,5L))")
      .head.getInt(0) == 2)
    assert(spark.sql(
      "SELECT size(graft_shingle_hashes(array('a','b','c'), 2, -1))")
      .head.getInt(0) == 2)
    val topk = spark.sql(
      """SELECT graft_topk(s, id, 2, false)
        |FROM VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS t(s, id)""".stripMargin)
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 2L), (2.0, 3L)))
    assert(spark.sql("SELECT graft_minhash_sig(array(5L, 9L))")
      .head.getSeq[Long](0).length == Dedup.MinhashK)
    assert(spark.sql("SELECT graft_simhash64(array('x','y'))").head.getLong(0) ==
           spark.sql("SELECT graft_simhash64(array('x','y'))").head.getLong(0))
  }

  test("SparkEntry.entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("incremental near-dup: truncated re-crawls recall their originals, verify stage exact") {
    import org.apache.spark.sql.functions._
    val out = Queries.all("q_dedup_incr_near")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // precision: the verify stage is exact, so every reported jac >= tau
    assert(out.forall(_._3 >= 0.8), out.filter(_._3 < 0.8).toSeq)
    // recall: every incoming doc whose TRUE shingle-jaccard vs its
    // original clears tau with margin must be matched to it (banding
    // P(miss | J >= 0.85) < 1e-4 at 12x4)
    val docs = Tables.docTokens(spark, TestSpark.sf0001)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), size(col("toks")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val matched = out.map(p => (p._1, p._2)).toSet
    for ((id, n) <- docs if n >= 3) {
      // dropping the last token: shingles (n-2) -> (n-3), J = (n-3)/(n-2)
      val trueJ = (n - 3).toDouble / (n - 2)
      if (trueJ >= 0.85)
        assert(matched.contains((id + 100000, id)),
               s"planted near-dup $id (J=$trueJ) not recalled")
    }
  }

  test("near-dup index append: accepted rows == a from-scratch rebuild's rows; matched docs appended nowhere") {
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val dir = TestSpark.sf0001
    val (sh, bandTab) = Dedup.nearDupIndex(spark, dir)
    val t = Tables.docTokens(spark, dir)
    val recrawl = t.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"),
              slice(col("toks"), lit(1), size(col("toks")) - 1).as("toks"))
    val novel = t.filter(col("doc_id") < 30)
      .select((col("doc_id") + 200000).as("doc_id"),
              transform(col("toks"), x => concat(lit("x"), x)).as("toks"))
    val incoming = recrawl.unionAll(novel)
    val (accSh, accBands) = Dedup.appendNearDupIndex(sh, bandTab, incoming)
    val accIds = accSh.select("doc_id").collect().map(_.getLong(0)).toSet
    // every >= tau matched doc is rejected, every novel doc accepted
    val matched = Dedup.incrementalNearDup(sh, bandTab, incoming)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accIds.intersect(matched).isEmpty)
    assert(accIds.exists(_ >= 200000), "novel docs must be accepted")
    // append == rebuild: the accepted docs' band rows are IDENTICAL to
    // what a from-scratch index build over the same docs produces (the
    // frozen-permutation contract — appending uses index-artifact
    // constants, so it can never drift from a rebuild)
    val (_, rebuiltBands) = Dedup.buildNearDupIndex(
      incoming.filter(col("doc_id").isInCollection(accIds)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "band", "bkey").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows(accBands) == rows(rebuiltBands))
    // and the shingle rows ride along 1:1 with the band docs
    assert(accBands.select("doc_id").distinct().count() == accIds.size)
  }

  test("q_hll_users: sketch-union estimate within 5% of exact distinct users") {
    import org.apache.spark.sql.functions._
    val approx = Queries.all("q_hll_users")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, TestSpark.sf0001)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((t, ex) <- exact) {
      val err = math.abs(approx(t) - ex).toDouble / ex
      assert(err <= 0.05, s"$t: approx=${approx(t)} exact=$ex err=$err")
    }
  }
}
