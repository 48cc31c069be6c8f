package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Runnable demo of the streaming operators: replays the sf0.001 events
  * table through a MemoryStream (plus one artificially late row) and
  * prints the closed tumbling windows and dedup behavior.
  *
  *   sbt "runMain graft.streaming.StreamDemo"
  */
object StreamDemo {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val rows = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
              col("event_type"), col("value"))
      .as[Ev].collect().toSeq.sortBy(_.ts.getTime)

    val ms = MemoryStream[Ev](spark)
    val q = EventStreams.tumblingCounts(ms.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("demo_tumbling")
      .outputMode("append").start()
    val (first, rest) = rows.splitAt(rows.size / 2)
    ms.addData(first); q.processAllAvailable()
    ms.addData(rest); q.processAllAvailable()
    // a row hours older than the watermark: must be dropped
    ms.addData(Seq(Ev(-1L, rows.head.ts, 0L, "late", 1e9))); q.processAllAvailable()
    q.stop()

    println("=== closed tumbling windows (append mode, watermark 10m) ===")
    spark.table("demo_tumbling").orderBy("ws", "event_type").show(10, false)
    val lateLeaked = spark.table("demo_tumbling")
      .filter(col("event_type") === "late").count()
    println(s"late rows leaked into closed windows: $lateLeaked (expect 0)")
    spark.stop()
  }
}
