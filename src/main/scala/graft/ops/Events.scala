package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time operators, batch form (SURVEY.md §2.2). The same
  * groupBy(window(...)) shapes run unchanged under Structured Streaming
  * (see graft.streaming) — watermarks are the only addition there.
  * Gap-based sessionization is the classic gaps-and-islands pattern:
  * one shuffle on user_id, two window passes, no state on the driver.
  *
  * All time arithmetic is integer microseconds (`unix_micros`) — the
  * oracle side uses `epoch_us` — so boundary comparisons are exact on
  * both engines (SURVEY.md §7.4.1).
  */
object Events {

  /** q_stream_tumbling: 1-hour tumbling windows per event_type. */
  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))
      .orderBy("ws", "event_type")

  /** q_stream_sliding: 1-hour windows sliding every 30 minutes — each
    * event lands in exactly two windows. */
  def qStreamSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))
      .orderBy("ws")

  /** q_stream_session: 30-minute-gap sessions per user
    * (gaps-and-islands: lag → new-session flag → running sum → agg). */
  def qStreamSession(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_id", "ts")
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 30L * 60 * 1000000
    e.withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull
          || (unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
              - unix_micros(col("prev").cast(org.apache.spark.sql.types.TimestampType))) > gapUs, 1)
        .otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_start")
  }
}
