package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.EventStreams

/** Streaming near-dup probe scale datapoint (r12, companion to
  * [[StreamThroughput]]): probe a replayed re-crawl stream against a
  * corpus's MATERIALIZED band index through
  * [[EventStreams.nearDupProbeStream]] and record end-to-end
  * throughput plus the state-store footprint —
  * `tools/run_main.sh graft.tools.NearDupStreamThroughput [corpusDir] [batchRows]`.
  *
  * The probe stream is every corpus document re-crawled with its last
  * token dropped (ids offset by 10⁶) — worst-case density: every
  * arriving row is a genuine near-dup that must band-collide, fetch
  * corpus shingles and pass exact verification, so the measured rate
  * is a lower bound on mixed traffic. Index build time is NOT on the
  * clock (it is the offline step [[Dedup.nearDupIndex]] materializes
  * once per corpus); only feed + micro-batch processing is. The only
  * stateful operator is the multi-band collision dedup
  * (`dropDuplicatesWithinWatermark`), so state tracks emitted pairs
  * within the watermark horizon, not the corpus. */
object NearDupStreamThroughput {
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
    val corpusDocs = sh.count() // forces the materialization
    val buildSec = (System.nanoTime() - buildT0) / 1e9

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val recrawl = graft.Tables.docTokens(spark, dir)
      .select(col("doc_id"),
              slice(col("toks"), lit(1), size(col("toks")) - 1).as("toks"))
      .orderBy("doc_id")

    val ms = MemoryStream[(Long, Seq[String], Timestamp)](spark)
    val probed = EventStreams.nearDupProbeStream(
      ms.toDF().toDF("doc_id", "toks", "ts"), sh, bands)
    val q = probed.writeStream.format("memory").queryName("st_neardup")
      .outputMode("append").start()

    import scala.jdk.CollectionConverters._
    var rowsIn = 0L
    var procNs = 0L
    recrawl.toLocalIterator().asScala.grouped(batchRows).foreach { chunk =>
      val batch = chunk.map { r =>
        val row = (r.getLong(0) + 1000000L, r.getSeq[String](1),
                   new Timestamp(base + rowsIn * 1000L))
        rowsIn += 1; row
      }
      val t0 = System.nanoTime()
      ms.addData(batch); q.processAllAvailable()
      procNs += System.nanoTime() - t0
    }
    val wallSec = procNs / 1e9
    val outRows = spark.table("st_neardup").count()
    val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val stateRows = st.map(_.numRowsTotal).sum
    val stateBytes = st.map(_.memoryUsedBytes).sum
    q.stop()

    println(f"NEARDUP_STREAM dir=$dir corpus_docs=$corpusDocs " +
      f"index_build_sec=$buildSec%.1f rows_in=$rowsIn rows_out=$outRows " +
      f"batch_rows=$batchRows wall_sec=$wallSec%.1f " +
      f"docs_per_sec=${rowsIn / wallSec}%.0f " +
      f"state_rows=$stateRows state_mb=${stateBytes / 1e6}%.1f")
    spark.stop()
  }
}
