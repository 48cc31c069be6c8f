package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Column-level data profiling — the "what is actually in this table"
  * report every ingestion pipeline runs before trusting a new drop:
  * per column, row count, null count, exact distinct count, and
  * min/max rendered as strings (one schema for every column type).
  *
  * Scale design: one aggregate per profiled column over a
  * SINGLE-COLUMN projection — each pass prunes to one parquet column
  * (the scan reads ~1/width of the table) and reduces to a 1-row
  * partial-agg result, so profiling C columns costs C column-pruned
  * scans and zero data shuffles (only 1-row partials move). That
  * beats one wide pass with C `count(distinct)`s, which Catalyst
  * plans as a C-way Expand (C× the scan rows through the first
  * shuffle). The unioned report is C rows.
  *
  * For an approximate-at-scale variant swap `countDistinct` for
  * `approx_count_distinct` (HLL, no distinct shuffle at all) — same
  * shape, exempt from the exact oracle; kept exact here so the report
  * is oracle-checkable.
  */
object Profile {

  /** Profile `cols` of `df`: one row per column with
    * (col_name, n_rows, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
                col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _).orderBy("col_name")
  }

  /** q_profile: [[profile]] over a mixed-type column set of `orders`
    * (bigint key, string status, double price, timestamp date). */
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir),
            Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate"))
}
