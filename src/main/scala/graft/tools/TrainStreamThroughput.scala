package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming training-assembly scale datapoint (r14 — VERDICT r13
  * #6, companion to [[TriadStreamThroughput]]): replay the corpus as
  * an arriving document stream through
  * [[EventStreams.trainingPipelineStream]] — incremental content
  * dedup → shared quality gate → stable hash shard → per-shard
  * stateful chunk packer — and record end-to-end throughput plus the
  * state footprint (the packer's state must be shards·2 longs, NOT
  * corpus-sized; the dedup store is the only corpus-growing state and
  * is watermark-bounded in production) —
  * `tools/run_main.sh graft.tools.TrainStreamThroughput [corpusDir] [batchRows]`.
  *
  * Worst-case density: every 10th document re-arrives as an exact
  * duplicate a batch later (the keeper state must kill it — event
  * time advances 10 ms/row so the replay stays inside the 10-minute
  * dedup horizon; a real deployment sizes the horizon to its
  * re-crawl window). */
object TrainStreamThroughput {
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

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")

    val ms = MemoryStream[(Long, String, Timestamp)](spark)
    val stream = EventStreams.trainingPipelineStream(
      ms.toDF().toDF("doc_id", "text", "ts"))
    val q = stream.toDF().writeStream.format("memory")
      .queryName("st_train").outputMode("append").start()

    import scala.jdk.CollectionConverters._
    var rowsIn = 0L
    var procNs = 0L
    var pendingDups: Seq[(Long, String, Timestamp)] = Seq.empty
    docs.toLocalIterator().asScala.grouped(batchRows).foreach { chunk =>
      val fresh = chunk.map { r =>
        rowsIn += 1
        (r.getLong(0), r.getString(1), new Timestamp(base + rowsIn * 10L))
      }
      // duplicates arrive a batch later, against settled state
      val batch = fresh ++ pendingDups
      rowsIn += pendingDups.size
      pendingDups = fresh.filter(_._1 % 10 == 0)
        .map { case (id, t, _) =>
          (id + 1000000L, t, new Timestamp(base + rowsIn * 10L)) }
      val t0 = System.nanoTime()
      ms.addData(batch); q.processAllAvailable()
      procNs += System.nanoTime() - t0
    }
    val wallSec = procNs / 1e9
    val outRows = spark.table("st_train").count()
    val shardsOut = spark.table("st_train").select("shard").distinct().count()
    val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val stateRows = st.map(_.numRowsTotal).sum
    val stateBytes = st.map(_.memoryUsedBytes).sum
    q.stop()

    println(f"TRAIN_STREAM dir=$dir rows_in=$rowsIn rows_out=$outRows " +
      f"shards=$shardsOut batch_rows=$batchRows wall_sec=$wallSec%.1f " +
      f"docs_per_sec=${rowsIn / wallSec}%.0f n_state_ops=${st.size} " +
      f"state_rows=$stateRows state_mb=${stateBytes / 1e6}%.1f")
    spark.stop()
  }
}
