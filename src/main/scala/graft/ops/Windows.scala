package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function family (SURVEY.md §2.2). Determinism discipline:
  * ranking windows that admit ties use a tie-capable key (bucketed
  * acctbal) for rank/dense_rank — whose results are order-stable under
  * ties — while row_number/ntile (which are NOT tie-stable) always get
  * a unique ordering key. Output always ends in a total order.
  */
object Windows {

  /** q_window_rank: row_number / rank / dense_rank / ntile. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("bal_bucket", floor(col("c_acctbal") / 1000))
    val wTies = Window.partitionBy("c_nationkey").orderBy(col("bal_bucket").desc)
    val wUnique = Window.partitionBy("c_nationkey")
      .orderBy(col("bal_bucket").desc, col("c_custkey").asc)
    c.select(
        col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
        rank().over(wTies).as("rnk"),
        dense_rank().over(wTies).as("drnk"),
        row_number().over(wUnique).as("rn"),
        ntile(4).over(wUnique).as("nt"))
      .orderBy("c_custkey")
  }

  /** q_window_analytic: lag / lead / first_value / last_value. */
  def qWindowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e.select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("lag_v"),
        lead(col("value"), 1).over(w).as("lead_v"),
        first(col("value")).over(wAll).as("first_v"),
        last(col("value")).over(wAll).as("last_v"))
      .orderBy("event_id")
  }

  /** q_window_frame_rows: running total + 3-row moving average. */
  def qWindowFrameRows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    e.select(
        col("event_id"), col("user_id"), col("value"),
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
          .as("running_sum"),
        round(avg(col("value")).over(w.rowsBetween(-2, 0)), 4).as("mov_avg3"),
        count(lit(1)).over(w.rowsBetween(-2, 0)).as("n_frame"))
      .orderBy("event_id")
  }

  /** q_window_frame_range: numeric RANGE frame — peers by value distance,
    * not row position. */
  def qWindowFrameRange(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc)
      .rangeBetween(-10000L, 0L)
    o.select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_near"),
        round(sum(col("o_totalprice")).over(w), 2).as("sum_near"))
      .orderBy("o_orderkey")
  }

  /** q_window_topk: top-3 per group via row_number filter — the
    * partition-parallel top-k idiom (no global sort at scale). */
  def qWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
             row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("c_nationkey", "rn")
  }

  /** q_window_dist: the distribution window functions — percent_rank
    * and cume_dist per status partition (the remaining members of the
    * rank family after q_window_rank). Same scale shape as every
    * window here: partitioned by a business key, never global. */
  def qWindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
              round(percent_rank().over(w), 6).as("pct_rank"),
              round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey")
  }
}
