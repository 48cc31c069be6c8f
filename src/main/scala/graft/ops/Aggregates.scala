package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Aggregation family (SURVEY.md §2.2): hash aggregation with automatic
  * partial (map-side) combine, exact + approximate distincts, and the
  * rollup/cube/grouping-sets hierarchy. All built-ins — at scale the
  * partial-agg + single shuffle on the group keys is the plan we want
  * and Catalyst produces it unaided.
  */
object Aggregates {

  /** q_agg_scan: TPC-H-Q1-style — filter + 8 aggregates over 2 group
    * keys. Money/quantity sums ride EXACT INTEGER UNITS (each addend
    * is a fixed-decimal value; round it to its scale, sum as BIGINT —
    * order-independent — and divide back out once): a raw
    * `round(sum(double), 2)` is a latent cross-engine coin flip when
    * a group's true total sits within the sum-order error of a
    * half-unit boundary, and the boundary audit measured this very
    * query's sf0.01 totals within ~116 ulps of one (same failure
    * class Q11 hit live — see Sql.q11Template). Averages derive from
    * the same exact sums. Per-row products stay IEEE doubles — both
    * engines compute them bit-identically; only the ORDER-dependent
    * reduction needs the integer carrier.
    *
    * The carrier is DECIMAL(38,0), not BIGINT: micro-unit charge sums
    * would cross 2⁶³ near sf≈160 (Spark wraps or throws where DuckDB
    * auto-promotes to HUGEINT — the exactness fix would itself become
    * the cross-engine divergence); 38 digits cover any realistic
    * corpus. */
  def qAggScan(spark: SparkSession, dir: String): DataFrame = {
    def units(c: Column, scale: Long): Column =
      round(c * lit(scale)).cast("decimal(38,0)")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(units(col("l_quantity"), 100L)).as("qc"),
        sum(units(col("l_extendedprice"), 100L)).as("pc"),
        sum(units(col("l_extendedprice") * (lit(1) - col("l_discount")),
                  10000L)).as("dc"),
        sum(units(col("l_extendedprice") * (lit(1) - col("l_discount"))
                    * (lit(1) + col("l_tax")), 1000000L)).as("cc"),
        sum(units(col("l_discount"), 100L)).as("dsc"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("qc").cast("double") / 100, 2).as("sum_qty"),
        round(col("pc").cast("double") / 100, 2).as("sum_base_price"),
        round(col("dc").cast("double") / 10000, 2).as("sum_disc_price"),
        round(col("cc").cast("double") / 1000000, 2).as("sum_charge"),
        round(col("qc").cast("double") / 100 / col("count_order"), 2).as("avg_qty"),
        round(col("pc").cast("double") / 100 / col("count_order"), 2).as("avg_price"),
        round(col("dsc").cast("double") / 100 / col("count_order"), 4).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q_agg_distinct: exact distinct aggregates (Expand-based plan when
    * multiple distinct columns are present). */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("dist_parts"),
        countDistinct(col("l_suppkey")).as("dist_supps"),
        round(sum_distinct(col("l_quantity")), 2).as("sum_dist_qty"))
      .orderBy("l_returnflag")

  /** q_agg_approx: HLL++ approximate distinct. Oracle-exempt (DuckDB's
    * HLL differs by design); ScalaTest asserts relative error vs exact. */
  def qAggApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** q_agg_rollup: hierarchical totals; GROUPING() flags distinguish
    * real nulls from rollup nulls. */
  def qAggRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
               col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** q_agg_cube: all 4 grouping combinations. */
  def qAggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
               col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** q_pivot: per-user value totals pivoted to one column per
    * event_type. Pivot values are enumerated explicitly — at scale an
    * implicit pivot triggers a distinct-values job first. */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(round(sum(col("value")), 2))
      .orderBy("user_id")

  /** q_percentiles: exact interpolated percentiles (median/p25/p90) per
    * group — the sort-based exact aggregate; the approximate sketch
    * variant is q_agg_approx's family. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"))
      .orderBy("l_returnflag")

  /** q_stats_moments: the statistical-aggregate family — sample
    * stddev/variance, correlation, sample covariance per group. All
    * single-pass mergeable moment aggregates (partial+final like any
    * hash agg — shuffle volume is group cardinality); rounded to 4
    * because the merge order perturbs the last ulps. */
  def qStatsMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_discount"), col("l_tax")), 6).as("covar_disc_tax"))
      .orderBy("l_returnflag")

  /** q_percentiles_approx: the SKETCH twin of [[qPercentiles]] —
    * `approx_percentile` (Greenwald-Khanna summaries: bounded-size
    * mergeable partials, the 100 TB path where exact percentile's
    * per-group sort is unaffordable). Oracle-exempt: the summary
    * depends on merge order; the golden bounds it against the exact
    * answer instead. */
  def qPercentilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.25, 10000)"), 4).as("p25"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4).as("median"),
        round(expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 4).as("p90"))
      .orderBy("l_returnflag")

  /** q_agg_grouping_sets: explicit sets ((rf),(ls),()) — the general
    * form rollup/cube desugar to. */
  def qAggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
               col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }

  /** Wide→long unpivot (melt): the lineitem measure columns become
    * (measure, value) rows keyed by (l_orderkey, l_linenumber) — the
    * reshape every metrics store and plotting layer wants. Catalyst's
    * `Expand` node emits all measure rows in ONE pass over the scan
    * (no per-measure re-read, no join) — the same narrow, shuffle-free
    * shape at any scale; only the presentation sort exchanges. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
              col("l_tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  /** Sketch-at-rest distinct counting: per (event_type, day) HLL
    * sketches of the user set are built ONCE (the shape you'd
    * materialize alongside daily partitions), then re-aggregated by
    * `hll_union_agg` into per-type totals — distinct users over any
    * span without ever re-touching raw events. The daily sketch is a
    * partial aggregate (map-side combine); the union pass moves only
    * KB-sized sketch blobs. THE pattern for 100 TB distinct-count
    * dashboards (one sketch per partition at rest, merge at query
    * time). Estimates are approximate → oracle-exempt; the golden
    * pins ≤ 5% error vs exact and exact agreement on a planted
    * single-user type. */
  def qHllUsers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
           count(lit(1)).as("n_daily_sketches"))
      .orderBy("event_type")
  }

  /** EXACT distinct counting via mergeable roaring-style bitmaps —
    * the precise sibling of [[qHllUsers]] for dense integer keys:
    * per (event_type, day, bitmap bucket) a fixed-width bitmap of
    * user-id bit positions is built (the at-rest granularity), then
    * re-aggregated by `bitmap_or_agg` — a byte-wise OR of mergeable
    * blobs — and summed per type. Same
    * materialize-per-partition/merge-at-query-time economics as the
    * HLL path, but the answer is exact, so the oracle is a plain
    * `count(DISTINCT ...)`. The trade: bitmap size scales with the
    * key-domain density (fine for surrogate-keyed ids), HLL's with
    * nothing — which is why both live in the library. */
  def qBitmapUsers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"),
               bitmap_bucket_number(col("user_id")).as("bkt"))
      .agg(bitmap_construct_agg(bitmap_bit_position(col("user_id"))).as("bm"))
    daily.groupBy("event_type", "bkt")
      .agg(bitmap_or_agg(col("bm")).as("bm"))
      .groupBy("event_type")
      .agg(sum(bitmap_count(col("bm"))).as("n_users"))
      .orderBy("event_type")
  }
}
