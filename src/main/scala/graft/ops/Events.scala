package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Ordered conversion funnel over ANY stage list — each stage counts
    * users whose first qualifying event strictly follows their previous
    * stage's first event (the product-analytics readout every event
    * store ships). One per-user min aggregate per stage chained by key
    * joins — shuffle volume is user-cardinality per stage — and a
    * |stages|-row union of global counts at the end. The library entry
    * point ([[graft.Graft.funnel]]); input needs
    * (user_id, event_type, ts). */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame =
    funnelWithin(events, stages, horizon = None)

  /** [[funnel]] with an optional per-step conversion horizon: when
    * `horizon` is set, each stage only counts qualifying events within
    * that interval AFTER the previous stage's first event — "converted
    * within the hour", the time-bounded readout product analytics
    * actually reports. Same shuffle shape as the unbounded form (the
    * horizon is one more predicate on the per-stage join). */
  def funnelWithin(events: DataFrame, stages: Seq[String],
                   horizon: Option[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")
    val ev = events.select("user_id", "event_type", "ts")
    var prev: Option[DataFrame] = None
    val perStage = stages.zipWithIndex.map { case (s, i) =>
      val base = ev.filter(col("event_type") === s)
      val cur = prev match {
        case None => base.groupBy("user_id").agg(min(col("ts")).as("t"))
        case Some(p) => base
          .join(p.select(col("user_id"), col("t").as("t_prev")), "user_id")
          .filter(col("ts") > col("t_prev") && horizon.map(h =>
              col("ts") <= col("t_prev") + expr(s"INTERVAL $h"))
            .getOrElse(lit(true)))
          .groupBy("user_id").agg(min(col("ts")).as("t"))
      }
      prev = Some(cur)
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(s).as("name"), col("n_users"))
    }
    perStage.reduce(_ unionAll _).orderBy("stage")
  }

  /** q_funnel: [[funnel]] over view → click → purchase. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir), Seq("view", "click", "purchase"))

  /** q_funnel_within: the same funnel with a 1-hour per-step
    * conversion horizon. */
  def qFunnelWithin(spark: SparkSession, dir: String): DataFrame =
    funnelWithin(Tables.events(spark, dir), Seq("view", "click", "purchase"),
                 horizon = Some("1 HOUR"))

  /** Weekly cohort retention — users bucketed by the week of their
    * first event, counted per (cohort week, week offset) of later
    * activity. Week arithmetic is whole-day `datediff` over DATE-cast
    * week starts (÷7 of an exact day count), not epoch-seconds over
    * timestamps — a spring-forward DST week is 601200 s, so epoch
    * division would truncate to N−1 in any non-UTC session timezone;
    * day counts are timezone-shape-independent. Two user-keyed
    * aggregates + one join; the output is cohort-weeks × offsets, a
    * bounded report. The library entry point
    * ([[graft.Graft.retention]]); input needs (user_id, ts). */
  def retention(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
    val first = ev.groupBy("user_id").agg(min(col("w")).as("cohort"))
    ev.distinct()
      .join(first, "user_id")
      .select(col("cohort"),
              floor(datediff(col("w").cast("date"), col("cohort").cast("date"))
                / 7).cast("int").as("week_offset"))
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      // DATE for cross-engine parity: DuckDB's date_trunc('week')
      // yields DATE while Spark's yields TIMESTAMP — same instant,
      // different physical type
      .select(col("cohort").cast("date").as("cohort"),
              col("week_offset"), col("n_users"))
      .orderBy("cohort", "week_offset")
  }

  /** q_retention: [[retention]] on the test events. */
  def qRetention(spark: SparkSession, dir: String): DataFrame =
    retention(Tables.events(spark, dir))

  /** Time-series resample with gap filling and forward fill: per key,
    * the event stream is bucketed to a fixed grain, EVERY grain in
    * [first, last] is materialized (missing buckets appear with
    * n = 0, v null), and `v_ff` carries the last observed value
    * forward — the regularization step before any windowed model
    * input or dashboard.
    *
    * Scale: the aggregate is one hash shuffle on (key, bucket); the
    * dense grid comes from a per-key `sequence` explode (bounded by
    * each key's own time span — no global calendar table, no
    * cross-key skew beyond the span itself), and the forward fill is
    * one per-key window pass (`last` with ignoreNulls over the
    * running frame). Nothing driver-side.
    */
  def resampleDaily(events: DataFrame): DataFrame = {
    val e = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"), col("value"))
      .groupBy("user_id", "d")
      .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n"))
    val bounds = e.groupBy("user_id").agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = bounds.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val ff = Window.partitionBy("user_id").orderBy("d")
    grid.join(e, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d").cast("date").as("d"), col("v"),
              coalesce(col("n"), lit(0L)).as("n"),
              last(col("v"), ignoreNulls = true).over(ff).as("v_ff"))
      .orderBy("user_id", "d")
  }

  /** q_resample: [[resampleDaily]] on a bounded user set (the dense
    * grid at test scale stays readable; the operator itself is
    * per-key bounded at any scale). */
  def qResample(spark: SparkSession, dir: String): DataFrame =
    resampleDaily(Tables.events(spark, dir).filter(col("user_id") < 20))

  /** SCD-type-2 dimension build: a change-event stream
    * (key, ts, attribute...) becomes the slowly-changing-dimension
    * table every warehouse keeps — one validity interval per change,
    * `valid_to` = the next change's instant (null while current).
    * One shuffle on the key, one window pass (`lead`); the interval
    * table then serves point-in-time lookups via the native as-of
    * join ([[graft.plans.AsOfJoin]]) or a BETWEEN range join.
    * Determinism: same-instant changes are ordered by `event_id`
    * (latest wins the interval end). */
  def scd2(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    updates
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
              col("ts").as("valid_from"), col("valid_to"),
              round(col("value"), 2).as("value"),
              col("valid_to").isNull.as("is_current"))
      // event_id in the sort: same-instant changes stay totally ordered
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** q_scd2: [[scd2]] over the purchase stream of a bounded user set
    * (each purchase updates the user's "last basket value"). */
  def qScd2(spark: SparkSession, dir: String): DataFrame =
    scd2(Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("user_id") < 100))

  /** Markov transition matrix over per-user event sequences: for every
    * consecutive (prev → next) event-type pair in a user's timeline
    * (ordered by ts, event_id tiebreak for same-instant events), the
    * pair count and the mean inter-event gap in microseconds. The
    * product-analytics complement to [[funnel]]: funnels test ONE
    * declared path, the transition matrix reports EVERY observed hop.
    *
    * Scale: one shuffle on user_id for the lag window (no global
    * sort), then a map-side-combined groupBy whose output is at most
    * |event types|² rows — a fixed-size report regardless of input
    * size, so the final single-partition sort is free. Gap arithmetic
    * stays in integer microseconds (`unix_micros`) through an EXACT
    * BIGINT sum — `avg(long)` buffers in DOUBLE (order-dependent once
    * group sums get large; the boundary audit measured an sf0.01
    * average within ~34 ulps of its rounding boundary), so the mean
    * is the integer sum divided by the count, identical either
    * engine, any fold order. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp"))
          - unix_micros(col("prev_ts").cast("timestamp")))
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(
        count(lit(1)).as("n"),
        // DECIMAL(38,0) carrier: micro-gap sums cross 2⁶³ at corpus
        // scale, where Spark's long sum wraps but DuckDB promotes
        sum(col("gap_us").cast("decimal(38,0)")).as("gap_sum"),
        // divisor = NON-NULL gap count, matching avg()'s null
        // semantics (a null ts row — none exist in the fixtures, but
        // the library contract shouldn't depend on that — joins n but
        // must not dilute the mean); the oracle divides by count(gap)
        // identically
        count(col("gap_us")).as("n_gap"))
      .select(col("prev_type"), col("next_type"), col("n"),
              round(col("gap_sum").cast("double") / col("n_gap"), 2).as("avg_gap_us"))
      .orderBy("prev_type", "next_type")
  }

  /** q_transitions: [[transitions]] over the full event stream. */
  def qTransitions(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables.events(spark, dir))

  /** Top-N 3-hop clickstream paths: every consecutive event-type
    * triple in a user's timeline (ts order, event_id tiebreak),
    * counted corpus-wide — the path-mining generalization of
    * [[transitions]] (hop pairs → hop triples).
    *
    * Scale: the same single user-keyed window shuffle as
    * [[transitions]] (two `lead`s ride one window pass), then a
    * map-side-combined count over ≤|types|³ path strings and a
    * top-N — bounded output, no second wide shuffle. */
  def eventPaths(events: DataFrame, topN: Int = 10): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .where(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topN)
  }

  /** q_paths: [[eventPaths]] over the full event stream. */
  def qPaths(spark: SparkSession, dir: String): DataFrame =
    eventPaths(Tables.events(spark, dir))

  /** Daily volume anomaly detection per event type: each day's event
    * count z-scored against the TRAILING 7-day window (rows between
    * 7 and 1 preceding — the current day never contaminates its own
    * baseline), `spike` flagged at |z| > 3 so both bursts AND stalls
    * trip it. Every calendar day in the type's [first, last] span is
    * materialized (the [[resampleDaily]] grid trick) with n = 0 —
    * otherwise a pipeline stall is a MISSING row (invisible, no
    * z-score) and the rows-frame silently reaches back across the
    * gap to pre-stall days.
    *
    * Scale: the daily rollup is map-side combined down to
    * |types| × |days| rows, so the grid fill and window pass run on
    * a bounded report, not raw events; days with a degenerate
    * baseline (fewer than 2 prior days, or zero variance) get z = 0,
    * never NULL. */
  def spikeDetect(events: DataFrame, zThr: Double = 3.0): DataFrame = {
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val bounds = daily.groupBy("event_type")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = bounds.select(col("event_type"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val filled = grid.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy("event_type").orderBy(col("d").asc)
      .rowsBetween(-7, -1)
    filled
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev(col("n")).over(w))
      .select(col("event_type"), col("d").cast("date").as("d"), col("n"),
        round(when(col("sd").isNull || col("sd") === 0.0, 0.0)
          .otherwise((col("n") - col("mu")) / col("sd")), 6).as("z"))
      .withColumn("spike", abs(col("z")) > lit(zThr))
      .orderBy("event_type", "d")
  }

  /** q_spike_detect: [[spikeDetect]] over the full event stream. */
  def qSpikeDetect(spark: SparkSession, dir: String): DataFrame =
    spikeDetect(Tables.events(spark, dir))

  /** Last-touch attribution: every conversion event is credited to
    * the same user's most recent PRECEDING touch event within
    * `horizon`; conversions with no in-horizon touch report as
    * channel `direct`. The revenue-accounting readout that closes
    * the loop [[funnel]] opens — funnels count users per stage,
    * attribution splits conversion count and value across the
    * channels that drove them.
    *
    * Scale: this is an as-of join in disguise, and the window form
    * IS the scale shape — one shuffle on user_id, one window pass
    * carrying the last touch (two `last(_, ignoreNulls)` columns
    * ride the same window; rows frame ends at `-1` so a conversion
    * never self-attributes), then a map-side-combined aggregate to
    * ≤ |touch types|+1 report rows. No join of conversions back
    * against touches (the naive form shuffles the event table
    * twice), no range predicate the optimizer would turn into a
    * nested loop.
    *
    * Determinism: the window orders by (ts, event_id) — a touch and
    * a conversion at the same instant resolve by event id, same as
    * every other sequence operator here ([[transitions]], [[scd2]]).
    * Horizon comparison is timestamp + INTERVAL in integer
    * microseconds on both engines — exact. */
  def attribution(events: DataFrame, touchTypes: Seq[String],
                  convType: String, horizon: String = "7 DAYS"): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: need at least one touch type")
    require(!touchTypes.contains(convType),
      "attribution: conversion type cannot also be a touch type")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes: _*)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
              col("event_type"), col("value"))
      // prune to the two roles BEFORE the shuffle: other event types
      // neither touch nor convert, and dropping them first keeps the
      // window partition narrow
      .filter(isTouch || col("event_type") === convType)
      .withColumn("lt_ts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("lt_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .select(
        when(col("lt_ts").isNotNull
               && col("ts") <= col("lt_ts") + expr(s"INTERVAL $horizon"),
             col("lt_type"))
          .otherwise(lit("direct")).as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conv"), round(sum(col("value")), 2).as("revenue"))
      .orderBy("channel")
  }

  /** q_attribution: [[attribution]] of purchases to view/click
    * touches within a 1-hour horizon. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(spark, dir), Seq("view", "click"),
                "purchase", horizon = "1 HOUR")

  /** Time-series gap fill: densify a per-(series, hour) metric onto
    * the full hourly spine and repair the holes two ways — last
    * observation carried forward (`v_ffill`) and linear interpolation
    * between the nearest observed neighbors (`v_lerp`, falling back
    * to the single available side at the edges).
    *
    * Scale design: the raw events reduce ONCE (partial-agg shuffle on
    * (series, hour)); everything after runs on the spine, whose size
    * is (hours in range) × (series) — a function of the time range,
    * not the event volume, so the window passes cost the same at
    * 100 TB as at sf0.01. The metric sums cent-rounded integer units
    * (DECIMAL(38,0)) so `v` is order-independent and the interpolated
    * values — computed from exact integer microsecond gaps — are
    * bit-identical across engines and partitionings.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("decimal(38,0)")).as("vc"))
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = events.select("event_type").distinct()
      .crossJoin(bounds) // 1-row bounds side: no real product
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hr"))
    val w = Window.partitionBy("event_type").orderBy(col("hr").asc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)
    val us = (c: Column) =>
      unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("v", (col("vc").cast("double") / 100))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("ph",
        last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nh",
        first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wNext))
      .select(col("event_type"),
        // date_trunc widens NTZ→LTZ; the fixture contract is NTZ
        col("hr").cast(org.apache.spark.sql.types.TimestampNTZType).as("hr"),
        col("n"),
        round(col("v"), 2).as("v"),
        round(col("pv"), 2).as("v_ffill"),
        round(
          when(col("v").isNotNull, col("v"))          // guards 0/0 at observed rows
            .when(col("pv").isNull, col("nv"))        // leading hole → backfill
            .when(col("nv").isNull, col("pv"))        // trailing hole → carry forward
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * (us(col("hr")) - us(col("ph"))).cast("double")
              / (us(col("nh")) - us(col("ph"))).cast("double")),
          6).as("v_lerp"))
      .orderBy("event_type", "hr")
  }

  /** q_gap_fill: [[gapFillHourly]] over the events table — 3600
    * hourly slots of which ~6% are empty at sf0.01. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame =
    gapFillHourly(Tables.events(spark, dir))

  /** Exponentially weighted moving average over a per-(series, day)
    * metric: `ewma_t = Σ_i x_i·decay^(t−i) / Σ_i decay^(t−i)` over
    * all observed days i ≤ t, with the exponent the CALENDAR day gap
    * (missing days decay the past farther — the time-aware form, not
    * the row-index form).
    *
    * Determinism: decay is fixed at 0.5, so every weight is a power
    * of two and each product x·2^−k is EXACT in binary floating
    * point; the fold runs in day order on both engines, so the
    * result is bit-identical. The daily metric itself sums
    * cent-rounded integer units, same as [[gapFillHourly]].
    *
    * Scale design: events reduce once to the (series, day) table —
    * bounded by the calendar, not the corpus — then the quadratic
    * window-history fold runs on that bounded table (30 days × 5
    * series at any sf). For multi-year spines swap the in-row fold
    * for the recursive one-pass form; at analytics granularities the
    * fold is the simpler plan and its cost is corpus-independent.
    */
  def ewmaDaily(events: DataFrame, decay: Double = 0.5): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("dy"))
      .agg(sum(round(col("value") * 100).cast("decimal(38,0)")).as("vc"))
      .withColumn("x", col("vc").cast("double") / 100).drop("vc")
    val w = Window.partitionBy("event_type").orderBy(col("dy").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("hist", collect_list(struct(col("dy"), col("x"))).over(w))
      .select(col("event_type"), col("dy").cast("date").as("dy"),
        round(col("x"), 2).as("x"),
        round(
          aggregate(col("hist"), lit(0.0d),
            (acc, s) => acc + s.getField("x")
              * pow(lit(decay), datediff(col("dy"), s.getField("dy"))))
          / aggregate(col("hist"), lit(0.0d),
            (acc, s) => acc + pow(lit(decay), datediff(col("dy"), s.getField("dy")))),
          6).as("ewma"))
      .orderBy("event_type", "dy")
  }

  /** q_ewma: [[ewmaDaily]] with decay 0.5 over the events table. */
  def qEwma(spark: SparkSession, dir: String): DataFrame =
    ewmaDaily(Tables.events(spark, dir))

  /** Rolling exact quantiles over the trailing `window`-observation
    * frame of the daily cent-exact value sum per event type — the
    * p50/p90 trend line every latency/volume dashboard draws. Exact,
    * not sketched: Spark's `percentile` runs as a window aggregate
    * over the ROWS frame, with the same linear-interpolation
    * definition as DuckDB's `quantile_cont` (h = (n−1)·q between the
    * two neighboring order statistics).
    *
    * Scale design: the corpus reduces once to the (type, day) table;
    * rolling windows then run on calendar-bounded rows. The frame is
    * "last k observations" (ROWS), deliberately not RANGE-by-days:
    * on a gappy series a calendar frame can hold a single
    * observation and the quantile degenerates; the observation frame
    * is what monitoring systems plot.
    *
    * Determinism: frame contents are exact cent doubles; percentile
    * sorts them (order-independent) and interpolates two order
    * statistics — identical on both engines. */
  def rollingQuantilesDaily(events: DataFrame, window: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("dy"))
      .agg(sum(round(col("value") * 100).cast("decimal(38,0)")).as("vc"))
      .withColumn("x", col("vc").cast("double") / 100).drop("vc")
    val frame = s"ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW"
    val over = s"OVER (PARTITION BY event_type ORDER BY dy $frame)"
    daily.select(col("event_type"), col("dy").cast("date").as("dy"),
        round(col("x"), 2).as("x"),
        round(expr(s"percentile(x, 0.5) $over"), 6).as("roll_p50"),
        round(expr(s"percentile(x, 0.9) $over"), 6).as("roll_p90"),
        expr(s"count(x) $over").as("roll_n"))
      .orderBy("event_type", "dy")
  }

  /** q_rolling_median: [[rollingQuantilesDaily]], 7-observation frame. */
  def qRollingMedian(spark: SparkSession, dir: String): DataFrame =
    rollingQuantilesDaily(Tables.events(spark, dir))

  /** Seasonal-profile anomaly detection: each (type, hour-of-day)
    * slot gets a seasonal baseline — the mean and population stddev
    * of that slot's daily event counts across the observed days —
    * and every concrete hour is z-scored against ITS OWN slot's
    * baseline. Catches "3 AM looks like 3 PM" anomalies that a
    * trailing-window detector ([[spikeDetect]]) normalizes away,
    * because the trailing window mixes all hours of day.
    *
    * Determinism: counts are integers; mean and variance come from
    * exact integer Σn and Σn² (computed as DECIMAL — n² overflows
    * nothing at any scale), so both engines divide the same exact
    * integers. Zero-count hours INSIDE each slot's observed span are
    * included via the spine (an absent hour is an anomaly candidate,
    * not a missing row).
    *
    * Scale: one (type, hour) reduction over the corpus; the spine,
    * profile, and z-scoring are calendar-bounded. */
  def seasonalAnomaly(events: DataFrame, zThr: Double = 2.0): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val filled = events.select("event_type").distinct()
      .crossJoin(bounds) // 1-row bounds side
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hr"))
      .join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("hod", hour(col("hr")))
    val prof = filled.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("cnt"),
           sum(col("n").cast("decimal(38,0)")).as("s1"),
           // cast BEFORE multiplying: long·long wraps past ~3e9/hour
           sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)")).as("s2"))
      .withColumn("mu", col("s1").cast("double") / col("cnt"))
      // population variance from exact sums: E[n²] − E[n]²
      .withColumn("sd", sqrt(col("s2").cast("double") / col("cnt")
                             - col("mu") * col("mu")))
      .select("event_type", "hod", "mu", "sd")
    filled.join(prof, Seq("event_type", "hod"))
      .withColumn("z",
        round(when(col("sd") === 0.0, 0.0)
          .otherwise((col("n") - col("mu")) / col("sd")), 6))
      .filter(abs(col("z")) > lit(zThr))
      .select(col("event_type"),
        col("hr").cast(org.apache.spark.sql.types.TimestampNTZType).as("hr"),
        col("hod"), col("n"), round(col("mu"), 6).as("mu"),
        round(col("sd"), 6).as("sd"), col("z"))
      .orderBy("event_type", "hr")
  }

  /** q_seasonal_anomaly: [[seasonalAnomaly]] at |z| > 2. */
  def qSeasonalAnomaly(spark: SparkSession, dir: String): DataFrame =
    seasonalAnomaly(Tables.events(spark, dir))

  /** Robust (median/MAD) outlier scoring of the daily event counts
    * per type — the Iglewicz–Hoaglin modified z-score
    * `0.6745·(n − median) / MAD`, flagged at |z| > 3.5. Mean/stddev
    * detectors ([[spikeDetect]], [[seasonalAnomaly]]) let a single
    * huge spike inflate its own baseline; median and MAD ignore it,
    * which is why this is the detector of record for dirty series.
    *
    * Determinism: counts are integers (zero-filled spine), medians of
    * integers are integers or exact halves, deviations likewise, and
    * the one division + fixed 0.6745 literal evaluate identically on
    * both engines. Scale: one daily reduction, then two
    * median passes + joins on the calendar-bounded table. */
  def robustOutliers(events: DataFrame, zThr: Double = 3.5): DataFrame = {
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val bounds = daily.groupBy("event_type")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val filled = bounds
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
      .join(daily, Seq("event_type", "d"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val med = filled.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = filled.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("n") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("rz",
        round(when(col("mad") === 0.0, 0.0)
          .otherwise(lit(0.6745) * (col("n") - col("med")) / col("mad")), 6))
      .select(col("event_type"), col("d").cast("date").as("d"), col("n"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        col("rz"), (abs(col("rz")) > lit(zThr)).as("outlier"))
      .orderBy("event_type", "d")
  }

  /** q_robust_z: [[robustOutliers]] at the standard 3.5 cut. */
  def qRobustZ(spark: SparkSession, dir: String): DataFrame =
    robustOutliers(Tables.events(spark, dir))

  /** Rolling distinct active users — DAU plus trailing `windows`-day
    * actives (the WAU/MAU product metric). A naive per-day
    * `count(distinct)` over a RANGE frame re-scans the window per
    * day; the scale shape instead EXPLODES each (user, active-day)
    * fact into the ≤w report days it contributes to (bounded
    * fan-out w), then one distinct + one count per report day —
    * shuffle volume w × user-day facts, independent of raw event
    * volume after the first reduction.
    *
    * Report days cover the observed span only; a trailing window may
    * extend before the first day (partial by definition, like every
    * production dashboard's left edge). */
  def rollingActives(events: DataFrame, window: Int = 7): DataFrame = {
    val userDays = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val dau = userDays.groupBy("d").agg(count(lit(1)).as("dau"))
    val span = events.agg(date_trunc("day", min(col("ts"))).as("d0"),
                          date_trunc("day", max(col("ts"))).as("d1"))
    // each active day contributes to the next `window` report days;
    // days past the observed span are pruned by the 1-row span join
    val contrib = userDays
      .select(col("user_id"),
        explode(sequence(col("d"),
          col("d") + expr(s"INTERVAL ${window - 1} DAYS"),
          expr("INTERVAL 1 DAY"))).as("rd"))
      .distinct()
    contrib.groupBy(col("rd").as("d"))
      .agg(count(lit(1)).as("active_w"))
      .crossJoin(span) // 1-row side
      .filter(col("d") <= col("d1"))
      .join(dau, Seq("d"), "left")
      .select(col("d").cast("date").as("d"),
              coalesce(col("dau"), lit(0L)).as("dau"),
              col("active_w"))
      .orderBy("d")
  }

  /** q_rolling_active: [[rollingActives]] with the 7-day window —
    * DAU + WAU per day. */
  def qRollingActive(spark: SparkSession, dir: String): DataFrame =
    rollingActives(Tables.events(spark, dir))

  /** Lag-k autocorrelation of the daily cent-exact value series per
    * event type — the seasonality/trend diagnostic read before any
    * forecast: Pearson r between (x_t, x_{t−k}) for k = 1..`maxLag`,
    * computed from EXACT integer-cent sums (Σx, Σy, Σxy, Σx², Σy², n
    * — all DECIMAL(38,0) carriers), so the one closed-form double
    * expression is identical on both engines. r is NULL when either
    * side of the pairing is constant (zero variance).
    *
    * Scale: one daily reduction; each lag is a self-join of the
    * calendar-bounded daily table shifted by k days — lag-pair
    * volume is maxLag × days × types, corpus-size-independent. */
  def autocorrDaily(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("dy"))
      .agg(sum(round(col("value") * 100).cast("decimal(38,0)")).as("vc"))
    val lags = (1 to maxLag).map(lit(_)).toArray
    val pairs = daily.select(col("event_type"), col("dy"), col("vc"))
      .withColumn("k", explode(array(lags: _*)))
      .withColumn("dy2", col("dy") + expr("make_interval(0, 0, 0, k)"))
      .as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type")
          && col("a.dy2") === col("b.dy"))
      .select(col("a.event_type").as("event_type"), col("a.k").as("k"),
              col("a.vc").as("x"), col("b.vc").as("y"))
    pairs.groupBy("event_type", "k")
      .agg(count(lit(1)).as("n"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("y")).as("sxy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"))
      .withColumn("vx", (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("vy", (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
      .select(col("event_type"), col("k"), col("n"),
        when(col("vx") === 0.0 || col("vy") === 0.0, lit(null).cast("double"))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / sqrt(col("vx") * col("vy")), 6)).as("r"))
      .orderBy("event_type", "k")
  }

  /** q_autocorr: [[autocorrDaily]] for lags 1..7. */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame =
    autocorrDaily(Tables.events(spark, dir))
}
