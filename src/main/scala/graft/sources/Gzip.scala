package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream, PushbackInputStream}
import java.util.zip.{CRC32, DataFormatException, Inflater}

/** Streaming reader/writer for CONCATENATED GZIP MEMBERS (RFC 1952) —
  * the `.warc.gz` convention real crawl corpora (Common Crawl et al.)
  * ship in: every WARC record is compressed as its own gzip member
  * and the members are concatenated, which is exactly what keeps a
  * compressed crawl segment streamable (no global dictionary) and
  * record-seekable (a byte offset from an index lands on a member
  * boundary). (Reference source category R1,
  * `NGramTransformTest.java:118` — the source side of the plugin's
  * ETL frame; gzip framing is the at-rest reality of that category.)
  *
  * From-scratch on `java.util.zip.Inflater` rather than
  * `GZIPInputStream` for one load-bearing reason: resync. A corrupt
  * member must cost ONE quarantine row, not the rest of the file —
  * the same audit contract as [[Warc]]'s record parser — and
  * `GZIPInputStream` either throws (CRC mismatch) or SILENTLY stops
  * at a malformed next-member header, both of which lose the tail of
  * the file. Owning the member framing means the reader knows the
  * exact raw-byte position when a member dies, can scan forward for
  * the next member magic (`1f 8b 08`), and can hand the parser an
  * in-band marker line that surfaces as a `_corrupt_record` row.
  *
  * Memory: nothing is materialized — the decompressed concatenation
  * is exposed as an `InputStream`, so [[Warc.parseStream]]'s
  * one-record high-water mark survives compression. One 8 KB input
  * buffer + one Inflater per open file.
  */
private[graft] object Gzip {

  /** Compresses `payload` as ONE complete gzip member (header +
    * deflate + CRC32/ISIZE trailer) — the sink-side unit. */
  def member(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payload.length / 3 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload)
    gz.close()
    bos.toByteArray
  }

  /** Magic sniff (2-byte mark/reset peek): does this stream start
    * with a gzip member? */
  def isGzipped(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val a = in.read(); val b = in.read()
    in.reset()
    a == 0x1f && b == 0x8b
  }

  /** Raised by [[memberStream]] when a member is corrupt (bad header,
    * corrupt deflate, truncated, CRC/ISIZE mismatch). By the time it
    * is thrown the stream has already RESYNCED to the next `1f 8b 08`
    * in the raw input, so the caller can quarantine one row and keep
    * reading. An exception — not an in-band marker — because the
    * record parser may be mid-`readFully` (inside a Content-Length
    * payload) when a member dies: injected marker bytes would be
    * silently swallowed AS payload, emitting a corrupted record with
    * a clean `_corrupt_record` and desynchronizing the next one. A
    * throw is unswallowable from any parser state. */
  final class CorruptMemberException(msg: String)
      extends java.io.IOException(msg)

  /** The decompressed concatenation of the stream's gzip members.
    * A corrupt member raises [[CorruptMemberException]] from `read`
    * AFTER resyncing the raw stream to the next member magic — one
    * quarantine row per dead member, the rest of the file survives.
    * A CRC/ISIZE mismatch necessarily surfaces after the member's
    * decompressed bytes were already delivered (the damage is only
    * provable at the trailer): the throw then flags the PRECEDING
    * record as suspect (or interrupts it mid-payload if the length
    * drifted) — audit-visible either way, never silent. Closing the
    * returned stream closes `raw`. */
  def memberStream(raw: InputStream): InputStream =
    new GzipMemberInputStream(raw)

  private final class GzipMemberInputStream(raw: InputStream)
      extends InputStream {
    private val in = new PushbackInputStream(raw, 1 << 16)
    private val inf = new Inflater(true) // raw deflate; member framing is ours
    private val crc = new CRC32
    private val buf = new Array[Byte](8192)
    private var lastFill = 0        // bytes of buf most recently fed to inf
    private var inMember = false
    private var eof = false

    override def read(): Int = {
      val b = new Array[Byte](1)
      val n = read(b, 0, 1)
      if (n < 0) -1 else b(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (eof) return -1
        if (!inMember) readHeader()
        else if (inf.finished()) finishMember()
        else if (inf.needsInput()) {
          val n = in.read(buf)
          if (n < 0) corrupt("truncated gzip member (EOF mid-deflate)")
          else { lastFill = n; inf.setInput(buf, 0, n) }
        } else {
          try {
            val n = inf.inflate(b, off, len)
            if (n > 0) { crc.update(b, off, n); return n }
            else if (inf.needsDictionary())
              corrupt("deflate stream requests a preset dictionary")
            // else: loop — finished()/needsInput() handled next pass
          } catch {
            case e: DataFormatException =>
              corrupt("corrupt deflate data: " + e.getMessage)
          }
        }
      }
      -1 // unreachable
    }

    /** Parses the next member header; sets `inMember`, or `eof` at a
      * clean boundary, or a corruption marker + resync. */
    private def readHeader(): Unit = {
      val b0 = in.read()
      if (b0 < 0) { eof = true; return }
      val b1 = in.read()
      if (b0 != 0x1f || b1 != 0x8b) {
        if (b1 >= 0) in.unread(b1)
        corrupt(f"expected gzip member magic, got 0x$b0%02x"); return
      }
      val cm = in.read()
      if (cm != 8) { corrupt(s"unsupported gzip compression method $cm"); return }
      val flg = in.read()
      var i = 0
      var trunc = flg < 0
      while (i < 6 && !trunc) { trunc = in.read() < 0; i += 1 } // MTIME,XFL,OS
      if (trunc) { corrupt("truncated gzip header"); return }
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        val l0 = in.read(); val l1 = in.read()
        if (l0 < 0 || l1 < 0) { corrupt("truncated FEXTRA length"); return }
        var n = l0 | (l1 << 8)
        while (n > 0) {
          if (in.read() < 0) { corrupt("truncated FEXTRA payload"); return }
          n -= 1
        }
      }
      if ((flg & 8) != 0 && !skipZString()) { corrupt("truncated FNAME"); return }
      if ((flg & 16) != 0 && !skipZString()) { corrupt("truncated FCOMMENT"); return }
      if ((flg & 2) != 0) { // FHCRC (present but unchecked — header already parsed)
        if (in.read() < 0 || in.read() < 0) { corrupt("truncated FHCRC"); return }
      }
      inf.reset(); crc.reset(); lastFill = 0; inMember = true
    }

    private def skipZString(): Boolean = {
      var c = in.read()
      while (c > 0) c = in.read()
      c == 0
    }

    /** Deflate body done: give unconsumed input back to the raw
      * stream, verify the 8-byte CRC32+ISIZE trailer. A mismatch
      * throws (framing is intact — the stream is already positioned
      * on the next member, so no resync scan is needed). */
    private def finishMember(): Unit = {
      val rem = inf.getRemaining
      val written = inf.getBytesWritten
      if (rem > 0) in.unread(buf, lastFill - rem, rem)
      val gotCrc = crc.getValue
      inf.reset(); crc.reset(); inMember = false
      val tr = new Array[Byte](8)
      var off = 0
      while (off < 8) {
        val n = in.read(tr, off, 8 - off)
        if (n < 0) {
          eof = true
          throw new CorruptMemberException("truncated gzip trailer")
        }
        off += n
      }
      def le32(i: Int): Long =
        (tr(i) & 0xffL) | ((tr(i + 1) & 0xffL) << 8) |
          ((tr(i + 2) & 0xffL) << 16) | ((tr(i + 3) & 0xffL) << 24)
      if (le32(0) != gotCrc)
        throw new CorruptMemberException("gzip member CRC32 mismatch")
      if (le32(4) != (written & 0xffffffffL))
        throw new CorruptMemberException("gzip member ISIZE mismatch")
    }

    /** Abandons the current member: unconsumed inflater input goes
      * back to the raw stream, the raw stream is scanned forward to
      * the next `1f 8b 08`, and THEN the corruption is raised — the
      * caller can quarantine and keep reading from the next member. */
    private def corrupt(why: String): Unit = {
      val rem = inf.getRemaining
      if (rem > 0) in.unread(buf, lastFill - rem, rem)
      inf.reset(); crc.reset(); inMember = false
      resync()
      throw new CorruptMemberException(why)
    }

    /** Scans the raw stream for the next member magic, leaving the
      * stream positioned ON it (or at EOF — flagged only after the
      * pending marker drains). */
    private def resync(): Unit = {
      while (true) {
        val b0 = in.read()
        if (b0 < 0) { eof = true; return }
        if (b0 == 0x1f) {
          val b1 = in.read()
          if (b1 == 0x8b) {
            val b2 = in.read()
            if (b2 == 0x08) {
              in.unread(0x08); in.unread(0x8b); in.unread(0x1f); return
            }
            if (b2 >= 0) in.unread(b2) // may start the real magic — re-examine
          } else if (b1 >= 0) in.unread(b1)
        }
      }
    }

    override def close(): Unit = {
      inf.end()
      in.close()
    }
  }
}
