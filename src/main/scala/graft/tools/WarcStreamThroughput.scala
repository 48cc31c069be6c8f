package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Warc
import graft.streaming.EventStreams

/** End-to-end WARC STREAMING ingest scale datapoint (r15 — VERDICT
  * r14 ask #6): the corpus' triad pages are rendered as real WARC
  * segment files (optionally `.warc.gz` per-record members — the
  * shipping format), landed into a watched directory in waves, and
  * pulled through [[Warc.readWarcStream]] →
  * [[Warc.pagesFromWarcStream]] → [[EventStreams.crawlTriadStream]]
  * (URL-dedup state → extraction → content-dedup state + quality
  * gates → stream-static near-dup probe against the materialized
  * band index). Records segments/s, pages/s and the state footprint
  * — the ingest-edge companion to [[TriadStreamThroughput]], which
  * measures the same pipeline off a MemoryStream (no container
  * parse).
  *
  * `tools/run_main.sh graft.tools.WarcStreamThroughput [corpusDir]
  * [nSegments] [gz|plain] [wavesize]` — run SERIALLY (timing). */
object WarcStreamThroughput {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf1")
    val nSegments = if (args.length > 1) args(1).toInt else 32
    val gz = args.length <= 2 || args(2) != "plain"
    val waveSize = if (args.length > 3) args(3).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // render the segments OFFLINE into a staging dir; the timed loop
    // only MOVES files into the watched dir (how a crawler actually
    // lands segments) and processes them
    val staging = java.nio.file.Files.createTempDirectory("graft_warc_stage")
    val watch = java.nio.file.Files.createTempDirectory("graft_warc_watch")
    val pages = graft.ops.Curation.triadPages(spark, dir)
    Warc.writeWarc(pages, staging.toString, nSegments, gzip = gz)
    val segs = new java.io.File(staging.toString).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val totalBytes = segs.map(_.length()).sum
    val (sh, bands) = graft.ops.Dedup.nearDupIndex(spark, dir)

    val stream = EventStreams.crawlTriadStream(
      Warc.pagesFromWarcStream(Warc.readWarcStream(spark, watch.toString)),
      sh, bands)
    val q = stream.writeStream.format("memory")
      .queryName("st_warc").outputMode("append").start()

    var procNs = 0L
    segs.grouped(waveSize).foreach { wave =>
      wave.foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(watch.toString, f.getName))
      }
      val t0 = System.nanoTime()
      q.processAllAvailable()
      procNs += System.nanoTime() - t0
    }
    val wallSec = procNs / 1e9
    val outRows = spark.table("st_warc").count()
    val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val stateRows = st.map(_.numRowsTotal).sum
    val stateBytes = st.map(_.memoryUsedBytes).sum
    q.stop()

    val nPages = pages.count()
    println(f"WARC_STREAM dir=$dir gz=$gz segments=${segs.length} " +
      f"bytes=${totalBytes / 1e6}%.1fMB pages=$nPages rows_out=$outRows " +
      f"wave=$waveSize wall_sec=$wallSec%.1f " +
      f"segments_per_sec=${segs.length / wallSec}%.2f " +
      f"pages_per_sec=${nPages / wallSec}%.0f " +
      f"mb_per_sec=${totalBytes / 1e6 / wallSec}%.1f " +
      f"n_state_ops=${st.size} state_rows=$stateRows " +
      f"state_mb=${stateBytes / 1e6}%.1f")
    spark.stop()
  }
}
