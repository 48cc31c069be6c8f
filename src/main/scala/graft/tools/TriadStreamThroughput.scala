package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.EventStreams

/** End-to-end crawl-triad scale datapoint (r13 — VERDICT r12 #6,
  * companion to [[NearDupStreamThroughput]]): replay the corpus as a
  * raw page stream (synthetic URL + html-wrapped body) through the
  * COMPOSED [[EventStreams.crawlTriadStream]] — URL dedup → markup
  * strip + content dedup + quality gates → near-dup band probe as ONE
  * streaming query — and record end-to-end throughput plus the
  * per-operator state footprint —
  * `tools/run_main.sh graft.tools.TriadStreamThroughput [corpusDir] [batchRows]`.
  *
  * Worst-case density on every stage: every 10th page is re-emitted
  * under a tracking-param URL variant (stage-1 state must kill it),
  * every surviving page is an exact re-crawl of a corpus doc (every
  * row band-collides, fetches corpus shingles and verifies at
  * jac 1.0). Index build is offline ([[Dedup.nearDupIndex]]); only
  * feed + micro-batch processing is on the clock. */
object TriadStreamThroughput {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf1")
    val batchRows = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buildT0 = System.nanoTime()
    val (sh, bands) = Dedup.nearDupIndex(spark, dir)
    val corpusDocs = sh.count()
    val buildSec = (System.nanoTime() - buildT0) / 1e9

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val pages = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")

    val ms = MemoryStream[(Long, String, String, Timestamp)](spark)
    val triad = EventStreams.crawlTriadStream(
      ms.toDF().toDF("doc_id", "url", "html", "ts"), sh, bands)
    val q = triad.writeStream.format("memory").queryName("st_triad")
      .outputMode("append").start()

    import scala.jdk.CollectionConverters._
    var rowsIn = 0L
    var procNs = 0L
    pages.toLocalIterator().asScala.grouped(batchRows).foreach { chunk =>
      val batch = chunk.flatMap { r =>
        val id = r.getLong(0)
        val html = s"<html><body><p>${r.getString(1)}</p></body></html>"
        val url = s"https://example.com/page-$id"
        val main = (id + 1000000L, url, html,
                    new Timestamp(base + rowsIn * 1000L))
        rowsIn += 1
        val dup = if (id % 10 == 0) {
          val d = (id + 2000000L, s"$url?utm_source=feed", html,
                   new Timestamp(base + rowsIn * 1000L))
          rowsIn += 1
          Seq(d)
        } else Seq.empty
        main +: dup
      }
      val t0 = System.nanoTime()
      ms.addData(batch); q.processAllAvailable()
      procNs += System.nanoTime() - t0
    }
    val wallSec = procNs / 1e9
    val outRows = spark.table("st_triad").count()
    val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val stateRows = st.map(_.numRowsTotal).sum
    val stateBytes = st.map(_.memoryUsedBytes).sum
    q.stop()

    println(f"TRIAD_STREAM dir=$dir corpus_docs=$corpusDocs " +
      f"index_build_sec=$buildSec%.1f rows_in=$rowsIn rows_out=$outRows " +
      f"batch_rows=$batchRows wall_sec=$wallSec%.1f " +
      f"pages_per_sec=${rowsIn / wallSec}%.0f n_state_ops=${st.size} " +
      f"state_rows=$stateRows state_mb=${stateBytes / 1e6}%.1f")
    spark.stop()
  }
}
