package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) source/sink — the container format real crawl
  * corpora arrive in (reference category: the source/sink rows R1/R10,
  * `NGramTransformTest.java:118,125`; WARC is what feeds the crawl
  * triad upstream of everything else).
  *
  * From-scratch reader: a WARC file is a sequence of records, each a
  * `WARC/1.x` version line + CRLF-terminated named headers + blank
  * line + exactly `Content-Length` payload bytes + a blank-line
  * separator. The format is NOT splittable (no sync markers, records
  * are length-prefixed back-to-back), so the unit of parallelism is
  * the FILE — exactly how crawl dumps are shipped (many ~1 GB
  * segments), so a 100 TB drop is ~100k files = ~100k tasks and the
  * cluster saturates on file count, not split count. Each task
  * STREAMS its file (`binaryFiles` + `PortableDataStream`): memory
  * high-water is one record's payload, never the whole file — the
  * reason this reader is not built on the whole-file `binaryFile`
  * DataFrame source ([[Formats.readBinary]] loads entire objects,
  * which is right for images and wrong for 1 GB containers).
  *
  * Audit contract (same as [[Formats.readJsonAudited]]): malformed
  * records do NOT poison the read and are not silently dropped — they
  * land as rows with `_corrupt_record` set (a bounded snippet of the
  * offending bytes) and null fields, and the parser RESYNCS to the
  * next plausible record boundary (a line starting with `WARC/`), so
  * one corrupt record costs one quarantine row, not the rest of the
  * file. Callers split on `_corrupt_record IS NULL`.
  */
object Warc {

  /** One parsed record. `content` is the raw payload (for
    * `WARC-Type: response` records that is the full HTTP response —
    * status line, headers, body; see [[httpBodyCol]]). */
  case class WarcRecord(path: String, warc_type: String, target_uri: String,
                        record_id: String, warc_date: String,
                        content_type: String, content: Array[Byte],
                        _corrupt_record: String)

  /** Deterministic fixture timestamp (WARC-Date is mandatory per spec;
    * a wall-clock stamp would break byte-for-byte reproducibility of
    * fixture files across runs). */
  val FixtureDate = "2026-01-01T00:00:00Z"

  /** Payload allocation cap: a hostile/corrupt Content-Length must
    * quarantine, never drive a multi-GB allocation (the riffWalk
    * discipline applied to WARC). Real CC records are ≤ ~1 MB HTML;
    * 64 MB is generous for any single crawl object. */
  val MaxRecordBytes: Long = 64L << 20

  // ------------------------------------------------------------------
  // Record rendering (sink side)
  // ------------------------------------------------------------------

  /** Renders one WARC record: version line, headers, Content-Length,
    * blank line, payload, record separator. Header names/values must
    * be ASCII with no CR/LF (enforced, not assumed: a hostile URL
    * containing "\r\n" would otherwise inject extra header lines and
    * the written record would round-trip as a quarantine row — the
    * sink fails LOUDLY instead of producing silent data loss the
    * reader has to mop up). URLs in crawl feeds are %-encoded by
    * definition, so real rows never trip this. */
  private[graft] def renderRecord(headers: Seq[(String, String)],
                                  payload: Array[Byte]): Array[Byte] = {
    headers.foreach { case (k, v) =>
      require(k.forall(c => c > ' ' && c < 127 && c != ':'),
        s"WARC header name not a clean ASCII token: ${snippet(k)}")
      require(v.forall(c => c >= ' ' && c < 127),
        s"WARC header value of '$k' contains control/non-ASCII bytes " +
          s"(CR/LF would inject header lines): ${snippet(v)}")
    }
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** A `warcinfo` lead record (real WARC files open with one; the
    * reader must skip it by type, which the round-trip spec pins). */
  private[graft] def warcinfoRecord(filename: String): Array[Byte] = {
    val fields = "software: graft\r\nformat: WARC File Format 1.0\r\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    renderRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> FixtureDate,
      "WARC-Filename" -> filename,
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$filename>",
      "Content-Type" -> "application/warc-fields"), fields)
  }

  /** A `response` record wrapping `html` in a minimal HTTP/1.1
    * response (status line + headers + blank line + body), the shape
    * crawl archives actually store. `docId` rides in WARC-Record-ID
    * so fixture ids survive the round trip. */
  private[graft] def responseRecord(docId: Long, url: String,
                                    html: String): Array[Byte] = {
    val body = html.getBytes(StandardCharsets.UTF_8)
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val payload = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(body, 0, payload, http.length, body.length)
    renderRecord(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:$docId>",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> FixtureDate,
      "Content-Type" -> "application/http; msgtype=response"), payload)
  }

  /** Shared record-file writer: one `.ext` file per partition (each
    * led by a warcinfo record) via the Hadoop FileSystem client —
    * Spark has no binary whole-file sink, and the FS client is the
    * portable route (local/HDFS/S3A). Deterministic layout:
    * hash-repartitioned on doc_id, sorted within each file.
    *
    * Commit protocol: each task writes an ATTEMPT-UNIQUE temp file
    * (`_tmp-<name>.attempt-<taskAttemptId>`) and renames it into
    * place only on success — a speculative or retried attempt can
    * never interleave bytes with the original into one part file,
    * and a failed attempt leaves only a `_tmp-` orphan (deleted
    * best-effort; the `_` prefix additionally hides it from every
    * Hadoop/Spark file listing — `FileInputFormat`'s hidden-file
    * filter and `InMemoryFileIndex` both skip `_`/`.`-prefixed
    * names, so readers can never observe an in-flight file even
    * between create and rename). Last-rename-wins resolves
    * concurrent attempts of the
    * same partition: both wrote identical content (the partition is
    * sorted and the render deterministic), so either rename yields a
    * correct file. `gzip` compresses each record as its OWN gzip
    * member (the Common-Crawl `.warc.gz` framing — per-record members
    * are what keep the format streamable and record-seekable). */
  private def writeRecordFiles(rows: DataFrame, path: String, nFiles: Int,
                               ext: String, gzip: Boolean = false,
                               cdx: Boolean = false)
                              (render: Row => Array[Byte]): Unit = {
    import org.apache.hadoop.fs.Path
    val ext1 = if (gzip) s"$ext.gz" else ext
    rows.repartition(nFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val name = f"part-$pid%05d.$ext1"
          // executor-side Configuration picks up the cluster defaults
          // from the classpath (and file:// needs none)
          val dest = new Path(path, name)
          val tmp = new Path(path, s"_tmp-$name.attempt-${tc.taskAttemptId()}")
          val fs = dest.getFileSystem(new org.apache.hadoop.conf.Configuration())
          def rendered(bytes: Array[Byte]): Array[Byte] =
            if (gzip) Gzip.member(bytes) else bytes
          // CDX sidecar rows: (file, doc_id, url, offset, length) per
          // DATA record — with per-record gzip members the (offset,
          // length) slice is one complete member, which is exactly why
          // crawl archives compress per record: byte-ranged point
          // reads stay possible through compression
          val cdxLines = new StringBuilder
          var ok = false
          var pos = 0L
          val out = fs.create(tmp, true)
          try {
            val info = rendered(warcinfoRecord(name))
            out.write(info); pos += info.length
            it.foreach { r =>
              val bytes = rendered(render(r))
              if (cdx)
                cdxLines.append(name).append('\t')
                  .append(r.getLong(0)).append('\t')
                  .append(r.getString(1)).append('\t')
                  .append(pos).append('\t')
                  .append(bytes.length).append('\n')
              out.write(bytes); pos += bytes.length
            }
            ok = true
          } finally {
            out.close()
            if (ok) {
              // commit = rename into place ONLY when dest is absent
              // (r16, ADVICE): the old delete-then-rename could lose a
              // part file forever if a duplicate (speculative/retried)
              // attempt died between deleting the already-committed
              // file and renaming its own copy. Attempts write
              // identical bytes for a partition, so "dest already
              // exists" IS success — drop this attempt's temp.
              if (fs.exists(dest) || !fs.rename(tmp, dest)) {
                if (!fs.exists(dest))
                  throw new java.io.IOException(
                    s"commit rename failed: $tmp -> $dest")
                fs.delete(tmp, false)
              }
            } else fs.delete(tmp, false)
          }
          if (ok && cdx) {
            // named so no data glob can match it (*.warc* / *.wet* /
            // *.wat*); committed with the same temp+rename protocol,
            // AFTER the data file — a reader never sees an index row
            // pointing at an uncommitted byte range
            val cdxName = f"index-part-$pid%05d.cdx"
            val cdxDest = new Path(path, cdxName)
            val cdxTmp = new Path(path, s"_tmp-$cdxName.attempt-${tc.taskAttemptId()}")
            val co = fs.create(cdxTmp, true)
            var cok = false
            try {
              co.write(cdxLines.toString.getBytes(StandardCharsets.UTF_8))
              cok = true
            } finally {
              co.close()
              if (cok) {
                // same exists-wins commit as the data file (r16)
                if (fs.exists(cdxDest) || !fs.rename(cdxTmp, cdxDest)) {
                  if (!fs.exists(cdxDest))
                    throw new java.io.IOException(s"cdx commit failed: $cdxDest")
                  fs.delete(cdxTmp, false)
                }
              } else fs.delete(cdxTmp, false)
            }
          }
        }
      }
  }

  /** Writes (doc_id, url, html) rows as `nFiles` WARC files of
    * HTTP-wrapped `response` records. `gzip = true` writes `.warc.gz`
    * — every record its own gzip member ([[Gzip.member]]), the
    * framing real crawl dumps ship in. */
  def writeWarc(pages: DataFrame, path: String, nFiles: Int,
                gzip: Boolean = false, cdx: Boolean = false): Unit =
    writeRecordFiles(
      pages.select(col("doc_id").cast("long"), col("url"), col("html")),
      path, nFiles, "warc", gzip, cdx)(r =>
      responseRecord(r.getLong(0), r.getString(1), r.getString(2)))

  /** A `conversion` record — the WET (extracted-text) member of the
    * format family: plain UTF-8 payload, no HTTP wrapping. */
  private[graft] def conversionRecord(docId: Long, url: String,
                                      text: String): Array[Byte] =
    renderRecord(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Record-ID" -> s"<urn:graft:$docId>",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> FixtureDate,
      "Content-Type" -> "text/plain"),
      text.getBytes(StandardCharsets.UTF_8))

  /** WET sink: (doc_id, url, text) rows as `conversion` records —
    * how extracted-text crawl drops actually ship (`.wet.gz` when
    * `gzip`, per-record members). */
  def writeWet(docs: DataFrame, path: String, nFiles: Int,
               gzip: Boolean = false): Unit =
    writeRecordFiles(
      docs.select(col("doc_id").cast("long"), col("url"), col("text")),
      path, nFiles, "wet", gzip)(r =>
      conversionRecord(r.getLong(0), r.getString(1), r.getString(2)))

  /** A `metadata` record — the WAT member of the crawl format triple:
    * per source page, derived metadata as a compact JSON payload
    * (real WAT is JSON too, a much fatter envelope). */
  private[graft] def metadataRecord(docId: Long, url: String,
                                    json: String): Array[Byte] =
    renderRecord(Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> s"<urn:graft:$docId>",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> FixtureDate,
      "Content-Type" -> "application/json"),
      json.getBytes(StandardCharsets.UTF_8))

  /** WAT sink (r15 — the third member of the WARC/WAT/WET triple):
    * per-page LINK METADATA as `metadata` records. `links` is the
    * [[graft.ops.Links.extractLinks]] output shape (doc_id, href,
    * anchor), rolled up to one sorted outlinks array per page and
    * serialized as a JSON payload; pages with no outlinks still get a
    * record (empty list) — a WAT file covers every response of its
    * WARC sibling. One hash shuffle on doc_id for the rollup, then
    * the shared committed record writer. */
  def writeWat(pages: DataFrame, links: DataFrame, path: String,
               nFiles: Int, gzip: Boolean = false): Unit = {
    val rolled = links
      .groupBy(col("doc_id").cast("long").as("doc_id"))
      .agg(sort_array(collect_list(struct(col("href"), col("anchor"))))
        .as("outlinks"))
    val rows = pages
      .select(col("doc_id").cast("long").as("doc_id"), col("url"))
      .join(rolled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("url"),
              when(col("outlinks").isNull, lit("""{"outlinks":[]}"""))
                .otherwise(to_json(struct(col("outlinks")))).as("json"))
    writeRecordFiles(rows, path, nFiles, "wat", gzip)(r =>
      metadataRecord(r.getLong(0), r.getString(1), r.getString(2)))
  }

  /** WAT source: good `metadata` records parsed back to
    * (doc_id, url, outlinks: array&lt;struct&lt;href, anchor&gt;&gt;).
    * The glob admits `.wat` and `.wat.gz`. */
  def readWat(spark: SparkSession, path: String,
              glob: String = "*.wat*"): DataFrame =
    readWarc(spark, path, glob)
      .where(col("warc_type") === "metadata" &&
             col("_corrupt_record").isNull)
      .select(docIdCol(col("record_id")).as("doc_id"),
              col("target_uri").as("url"),
              from_json(col("content").cast("string"),
                  "outlinks ARRAY<STRUCT<href: STRING, anchor: STRING>>",
                  Map.empty[String, String])
                .getField("outlinks").as("outlinks"))

  /** WET source: the same streaming parser ([[readWarc]]) filtered to
    * good `conversion` records, payload decoded as UTF-8 —
    * (doc_id, url, text), ready for the curation pipeline with no
    * HTML extraction stage. The glob admits `.wet` and `.wet.gz`. */
  def readWet(spark: SparkSession, path: String,
              glob: String = "*.wet*"): DataFrame =
    readWarc(spark, path, glob)
      .where(col("warc_type") === "conversion" &&
             col("_corrupt_record").isNull)
      .select(docIdCol(col("record_id")).as("doc_id"),
              col("target_uri").as("url"),
              col("content").cast("string").as("text"))

  // ------------------------------------------------------------------
  // Streaming parser (source side)
  // ------------------------------------------------------------------

  /** One CRLF/LF-terminated line as ISO-8859-1 (header charset; any
    * byte decodes, so resync over binary junk can't throw). Null at
    * EOF-before-any-byte. */
  private def readLine(in: InputStream): String = {
    var c = in.read()
    if (c < 0) return null
    val sb = new java.lang.StringBuilder(64)
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(s"record truncated at $off/$n")
      off += k
    }
    buf
  }

  private def snippet(s: String): String =
    if (s.length <= 200) s else s.substring(0, 200)

  /** Streams records off `in`. Lazy: pulls one record per `next()`,
    * so the caller's flatMap keeps only one payload in memory. The
    * stream is closed on exhaustion AND unconditionally at task end
    * (a completion listener registered here, so limit/take
    * short-circuits release both the file handle and the gzip
    * layer's native Inflater). Transparently handles gzipped input
    * (2-byte magic sniff → [[Gzip.memberStream]]): `.warc` and
    * `.warc.gz` flow through the identical record parser, and the
    * one-record memory high-water survives compression because the
    * member layer is itself streaming. A corrupt gzip member raises
    * [[Gzip.CorruptMemberException]] from the read — caught here
    * into one quarantine row from WHATEVER parser state (header
    * line, mid-payload), with the member layer already resynced to
    * the next member, whose decompressed bytes re-enter the normal
    * record loop. */
  private[graft] def parseStream(in0: InputStream,
                                 path: String): Iterator[WarcRecord] = {
    val base = new BufferedInputStream(in0, 1 << 16)
    val plain =
      if (Gzip.isGzipped(base))
        new BufferedInputStream(Gzip.memberStream(base), 1 << 16)
      else base
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        try plain.close() catch { case _: java.io.IOException => () }
      })
    new Iterator[WarcRecord] {
      private val in = plain
      private var pending: String = null // a WARC/ line found during resync
      private var nextRec: WarcRecord = null
      private var closed = false

      private def corrupt(why: String, raw: String): WarcRecord =
        WarcRecord(path, null, null, null, null, null, Array.emptyByteArray,
                   why + ": " + snippet(raw))

      /** Line-scan forward to the next `WARC/` line (stashed in
        * `pending` for the next advance). */
      private def resync(): Unit = {
        var l = readLine(in)
        while (l != null && !l.startsWith("WARC/")) l = readLine(in)
        pending = l
      }

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !closed) try {
          val first =
            if (pending != null) { val p = pending; pending = null; p }
            else readLine(in)
          if (first == null) { closed = true; in.close() }
          else if (first.isEmpty) () // inter-record blank line
          else if (!first.startsWith("WARC/")) {
            nextRec = corrupt("not a WARC record", first)
            resync()
          } else {
            // header block to the blank line
            val hdrs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
            var bad: String = null
            var l = readLine(in)
            while (l != null && l.nonEmpty) {
              val i = l.indexOf(':')
              if (i <= 0) { if (bad == null) bad = l }
              else hdrs += ((l.substring(0, i).trim.toLowerCase,
                             l.substring(i + 1).trim))
              l = readLine(in)
            }
            val h = hdrs.toMap
            val cl = h.get("content-length")
              .flatMap(s => scala.util.Try(s.toLong).toOption)
            if (l == null) {
              nextRec = corrupt("EOF in header block", first); closed = true
              in.close()
            } else if (cl.isEmpty || cl.get < 0 || cl.get > MaxRecordBytes) {
              nextRec = corrupt("bad Content-Length",
                                first + " " + h.getOrElse("content-length", "<missing>"))
              resync()
            } else if (bad != null) {
              nextRec = corrupt("malformed header line", bad)
              resync()
            } else {
              try {
                val payload = readFully(in, cl.get.toInt)
                nextRec = WarcRecord(path,
                  h.getOrElse("warc-type", null),
                  h.getOrElse("warc-target-uri", null),
                  h.getOrElse("warc-record-id", null),
                  h.getOrElse("warc-date", null),
                  h.getOrElse("content-type", null),
                  payload, null)
              } catch { case _: EOFException =>
                nextRec = corrupt("truncated payload", first)
                closed = true; in.close()
              }
            }
          }
        } catch {
          // a dead gzip member: the member layer has already resynced
          // to the next member — quarantine one row and keep reading
          case e: Gzip.CorruptMemberException =>
            nextRec = corrupt("gzip member corrupt", e.getMessage)
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Array façade of [[parseStream]] for specs. */
  private[graft] def parseRecords(bytes: Array[Byte],
                                  path: String = "mem"): Seq[WarcRecord] =
    parseStream(new java.io.ByteArrayInputStream(bytes), path).toSeq

  /** Reads a directory of WARC files as a DataFrame of
    * (path, warc_type, target_uri, record_id, warc_date, content_type,
    * content, _corrupt_record). One task per file (the format is not
    * splittable — and `.warc.gz` per-record members keep it that way
    * on purpose: parallelism stays the FILE, the shipping unit), each
    * streaming its file with one-record memory. Plain and gzipped
    * files mix freely under one glob (per-file magic sniff). A task
    * that does not exhaust its iterator (limit/take short-circuits
    * the flatMap) still releases the file handle AND the gzip
    * layer's native Inflater: [[parseStream]] registers a
    * task-completion listener on the whole stream chain. */
  def readWarc(spark: SparkSession, path: String,
               glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(s"$path/$glob")
      .flatMap { case (p, pds) => parseStream(pds.open(), p) }
      .toDF()
  }

  // ------------------------------------------------------------------
  // CDX record index + ranged point reads (r15): what makes a 100 TB
  // archive RANDOMLY ACCESSIBLE — full scans are for pipelines, but
  // serving/debugging/sampling needs "give me THIS record" without
  // reading the segment. The sidecar maps (doc_id, url) → (file,
  // offset, length); per-record gzip members make the byte slice a
  // complete decompressible unit (the reason the framing exists).
  // ------------------------------------------------------------------

  /** The CDX sidecars of a record-file directory as a DataFrame
    * (file, doc_id, url, offset, length) — written by the sinks when
    * `cdx = true`. */
  def readCdx(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      // the writer emits RAW unquoted TSV lines; disable the CSV
      // reader's quote handling to match (r16, ADVICE: a legal '"' in
      // a URL would otherwise misparse the row and corrupt the
      // offset/length columns feeding ranged reads)
      .option("quote", "\u0000")
      .schema("file STRING, doc_id LONG, url STRING, offset LONG, length LONG")
      .csv(s"$path/*.cdx")

  /** Distributed RANGED point reads: each (file, offset, length) row
    * seeks into its segment and parses exactly that slice (a complete
    * gzip member or plain record — [[parseStream]]'s magic sniff
    * handles both). Rows are routed per file and fetched in offset
    * order on ONE reused stream per file (forward seeks, no reopen
    * churn); hostile lengths are quarantined, never allocated. At
    * cluster scale this is the batched point-read pattern over object
    * storage (ranged GETs grouped by object). */
  def fetchRecords(spark: SparkSession, dir: String,
                   cdx: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    cdx.select(col("file"), col("offset"), col("length"))
      .repartition(col("file"))
      .sortWithinPartitions("file", "offset")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def closeIn(): Unit = if (in != null) {
          try in.close() catch { case _: java.io.IOException => () }
          in = null
        }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeIn()))
        it.flatMap { case (file, off, len) =>
          def quarantine(why: String) =
            Iterator.single(WarcRecord(file, null, null, null, null, null,
              Array.emptyByteArray, why))
          if (len < 0 || len > MaxRecordBytes + 4096)
            quarantine(s"cdx: hostile length $len")
          else if (off < 0)
            quarantine(s"cdx: negative offset $off")
          else try {
            if (file != curFile) {
              closeIn()
              val p = new org.apache.hadoop.fs.Path(dir, file)
              in = p.getFileSystem(conf).open(p)
              curFile = file
            }
            in.seek(off)
            val buf = new Array[Byte](len.toInt)
            in.readFully(buf)
            parseRecords(buf, s"$file@$off")
          } catch {
            // a drifted/stale index row (offset past EOF, rewritten
            // segment, missing file) costs ONE quarantine row — the
            // same contract as hostile lengths; it must not fail the
            // task and take a 100k-record point-read batch with it.
            // The stream may be mid-file in an unknown state — drop
            // it so the next row reopens cleanly.
            case e: java.io.IOException =>
              closeIn(); curFile = null
              quarantine(s"cdx: unreadable range $file@$off+$len: ${e.getMessage}")
          }
        }
      }
  }

  /** One streamed WARC record: [[WarcRecord]] flattened with the
    * file's modification time (the natural event time of a crawl
    * drop — segments land, records flow). */
  case class WarcStreamRecord(path: String, ts: java.sql.Timestamp,
                              warc_type: String, target_uri: String,
                              record_id: String, warc_date: String,
                              content_type: String, content: Array[Byte],
                              _corrupt_record: String)

  /** STREAMING WARC source: new `.warc` segments appearing under
    * `path` are parsed incrementally — the ingest edge of a live
    * crawl, composing directly with
    * [[graft.streaming.EventStreams.crawlTriadStream]] via
    * [[pagesFromWarcStream]]. Built on the binaryFile file-stream
    * source (explicit schema — file streams cannot infer), so the
    * unit of arrival is the SEGMENT: each new file is parsed with the
    * same quarantine-and-resync parser as the batch reader
    * ([[parseRecords]]). Memory note: the file-stream source hands
    * whole files (unlike the batch reader's one-record streaming), so
    * executor memory bounds the segment size — crawlers ship ~100 MB
    * to 1 GB segments, which is what executor sizing budgets for. */
  def readWarcStream(spark: SparkSession, path: String,
                     glob: String = "*.warc*"): Dataset[WarcStreamRecord] = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", glob).load(path)
      .select(col("path"), col("modificationTime").as("ts"), col("content"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (p, ts, bytes) =>
        parseRecords(bytes, p).map(r =>
          WarcStreamRecord(p, ts, r.warc_type, r.target_uri, r.record_id,
                           r.warc_date, r.content_type, r.content,
                           r._corrupt_record))
      }
  }

  /** STREAMING WET sink (r15): a curated document stream emitted as
    * one gzipped WET segment directory per micro-batch — the OUTPUT
    * edge that closes the streaming crawl loop (readWarcStream →
    * crawlTriadStream → writeWetStream): raw segments land, curated
    * text ships, in the same format family it arrived in. Segment-
    * per-batch is the real pattern (one WET drop per ingest window);
    * consumers glob across the batch dirs (readWet over `path/&#42;`).
    * `docs` must be a STREAMING (doc_id, url, text) frame; returns
    * the started query (caller owns lifecycle). Batch dirs are
    * zero-padded so lexical order = arrival order. */
  def writeWetStream(docs: DataFrame, path: String, nFiles: Int = 1,
                     gzip: Boolean = true,
                     checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          writeWet(batch, f"$path/batch-$id%06d", nFiles, gzip)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** Good `response` records of a WARC stream unwrapped to the
    * (doc_id, url, html, ts) page shape `crawlTriadStream` consumes. */
  def pagesFromWarcStream(records: Dataset[WarcStreamRecord]): DataFrame =
    records.toDF()
      .where(col("warc_type") === "response" &&
             col("_corrupt_record").isNull)
      .select(docIdCol(col("record_id")).as("doc_id"),
              col("target_uri").as("url"),
              httpBodyCol(col("content")).as("html"),
              col("ts"))

  /** HTTP response body: everything after the first CRLFCRLF of the
    * payload (the status-line/header block), decoded as UTF-8. Pure
    * column arithmetic — stays in whole-stage codegen, no UDF. */
  def httpBodyCol(content: Column): Column = {
    val s = content.cast("string")
    val p = locate("\r\n\r\n", s)
    when(p > 0, s.substr(p + lit(4), length(s))).otherwise(s)
  }

  /** The fixture doc_id carried in `WARC-Record-ID: <urn:graft:N>`. */
  def docIdCol(recordId: Column): Column =
    regexp_extract(recordId, "urn:graft:(\\d+)", 1).cast("long")
}
