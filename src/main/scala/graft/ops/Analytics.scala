package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Customer/product analytics operators: RFM segmentation, market-
  * basket association rules, CUSUM changepoint detection. All exact
  * and oracle-checkable: integer count/cent carriers, deterministic
  * ntile orderings (id tiebreaks), and sequential folds whose order
  * both engines share. */
object Analytics {

  /** RFM segmentation of purchase behavior: per user, recency (days
    * from last purchase to the corpus horizon), frequency (purchase
    * count), monetary (cent-exact value sum), each quintiled into a
    * 1–5 score (5 = best) with a deterministic (metric, user_id)
    * ntile ordering, concatenated into the classic `rfm` segment
    * code.
    *
    * Scale: one filter + partial-agg per-user reduction, one 1-row
    * horizon aggregate, then three PARALLEL global ranks over the
    * USER table (r9: range-partitioned sort + zipWithIndex — the
    * [[TextAnalysis.qualityTiers]] discipline — instead of
    * single-partition ntile windows: at the design point the user
    * table is itself billion-row, and a global `Window.orderBy` would
    * funnel it through one task). The quintile comes from the exact
    * closed-form ntile formula on the rank (remainder rows in the
    * FIRST buckets — byte-identical to SQL ntile on both engines). */
  def rfm(events: DataFrame, purchaseType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    val p = events.filter(col("event_type") === purchaseType)
    val horizon = p.agg(max(date_trunc("day", col("ts"))).as("h"))
    val per = p.groupBy("user_id")
      .agg(max(date_trunc("day", col("ts"))).as("last_d"),
           count(lit(1)).as("frequency"),
           sum(round(col("value") * 100).cast("decimal(38,0)")).as("mc"))
      .crossJoin(horizon) // 1-row side
      .select(col("user_id"),
        datediff(col("h").cast("date"), col("last_d").cast("date"))
          .cast("long").as("recency_days"),
        col("frequency"),
        (col("mc").cast("double") / 100).as("monetary"))
      // consumed four times (count + three rank sorts + final join):
      // materialize once, cut the event-scan lineage
      .localCheckpoint()
    val n = per.count()
    if (n == 0)
      return per.select(col("user_id"), col("recency_days"),
        col("frequency"), col("monetary"),
        lit(0).as("r_score"), lit(0).as("f_score"), lit(0).as("m_score"),
        lit("").as("segment")).limit(0)
    // exact SQL-ntile bucket from a 1-based global rank: the first
    // (n mod k) buckets take ceil(n/k) rows, the rest floor(n/k)
    val k = 5L
    val fl = n / k
    val rem = n % k
    def tileExpr(rank: String): String =
      if (fl == 0L) rank // fewer rows than buckets: bucket = rank
      else s"(case when $rank <= ${rem * (fl + 1)}L" +
           s" then ($rank - 1) div ${fl + 1}L + 1" +
           s" else $rem + ($rank - 1 - ${rem * (fl + 1)}L) div ${fl}L + 1 end)"
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val idField = per.schema("user_id")
    // one parallel global rank per metric: range sort (all partitions
    // participate) + zipWithIndex per-partition offsets; the id column
    // keeps whatever type the caller supplied
    def rankOf(metric: String, out: String): DataFrame =
      spark.createDataFrame(
        per.select(col("user_id"), col(metric))
          .orderBy(col(metric).asc, col("user_id").asc)
          .rdd.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row(r.get(0), i + 1L) },
        StructType(Seq(idField.copy(name = "user_id"),
                       StructField(out, LongType))))
    per
      .join(rankOf("recency_days", "rk_r"), Seq("user_id"))
      .join(rankOf("frequency", "rk_f"), Seq("user_id"))
      .join(rankOf("monetary", "rk_m"), Seq("user_id"))
      .withColumn("r_score", expr(s"cast(6 - ${tileExpr("rk_r")} as int)"))
      .withColumn("f_score", expr(s"cast(${tileExpr("rk_f")} as int)"))
      .withColumn("m_score", expr(s"cast(${tileExpr("rk_m")} as int)"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        round(col("monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy("user_id")
  }

  /** q_rfm: [[rfm]] over purchase events. */
  def qRfm(spark: SparkSession, dir: String): DataFrame =
    rfm(Tables.events(spark, dir))

  /** Market-basket association rules over per-(user, day) baskets of
    * distinct event types: for each unordered type pair, support,
    * both conditional confidences, and lift — the co-engagement
    * readout behind "users who X also Y".
    *
    * Scale: baskets reduce by one distinct shuffle; the within-basket
    * self-join fans out ≤|types|² per basket (bounded by the type
    * vocabulary, not data volume); margins and the final report are
    * type-bounded. All ratios derive from exact integer counts. */
  def marketBasket(events: DataFrame): DataFrame = {
    val items = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"),
              col("event_type").as("item"))
      .distinct()
    val nBaskets = items.select("user_id", "d").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemN = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"), Seq("user_id", "d"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("x"), col("b.item").as("y"))
      .agg(count(lit(1)).as("n_xy"))
    pairs
      .join(itemN.withColumnRenamed("item", "x").withColumnRenamed("n_item", "n_x"), "x")
      .join(itemN.withColumnRenamed("item", "y").withColumnRenamed("n_item", "n_y"), "y")
      .crossJoin(nBaskets) // 1-row side
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("n_baskets"),
        round(col("n_xy").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_xy").cast("double") / col("n_x"), 6).as("conf_x_y"),
        round(col("n_xy").cast("double") / col("n_y"), 6).as("conf_y_x"),
        round(col("n_xy").cast("double") * col("n_baskets")
          / (col("n_x").cast("double") * col("n_y")), 6).as("lift"))
      .orderBy("x", "y")
  }

  /** q_market_basket: [[marketBasket]] over the events table. */
  def qMarketBasket(spark: SparkSession, dir: String): DataFrame =
    marketBasket(Tables.events(spark, dir))

  /** Two-sided CUSUM changepoint detection on the daily count series
    * per event type: counts standardized against the per-type global
    * mean/population-sd (both from exact integer Σn/Σn²), then the
    * classic recursions `c⁺ = max(0, c⁺ + s − k)` and
    * `c⁻ = max(0, c⁻ − s − k)` with slack k, alarm at > h. The
    * recursion is a SEQUENTIAL fold — implemented as an in-row
    * `aggregate` over the window-collected history, whose order (day
    * order) and operations both engines share exactly, so the result
    * is bit-identical without an FP exemption.
    *
    * Scale: one daily reduction; folds run on the calendar-bounded
    * table (same quadratic-in-days contract as [[Events.ewmaDaily]],
    * declared there). */
  def cusum(events: DataFrame, k: Double = 0.5, h: Double = 5.0): DataFrame = {
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
           sum(col("n").cast("decimal(38,0)")).as("s1"),
           sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)")).as("s2"))
      .withColumn("mu", col("s1").cast("double") / col("cnt"))
      .withColumn("sd", sqrt(col("s2").cast("double") / col("cnt")
                             - col("mu") * col("mu")))
      .select("event_type", "mu", "sd")
    val w = Window.partitionBy("event_type").orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(broadcast(stats), "event_type")
      .withColumn("s",
        when(col("sd") === 0.0, 0.0).otherwise((col("n") - col("mu")) / col("sd")))
      .withColumn("hist", collect_list(col("s")).over(w))
      .select(col("event_type"), col("d").cast("date").as("d"), col("n"),
        round(col("s"), 6).as("s"),
        round(aggregate(col("hist"), lit(0.0d),
          (acc, x) => greatest(lit(0.0d), acc + x - lit(k))), 6).as("cusum_pos"),
        round(aggregate(col("hist"), lit(0.0d),
          (acc, x) => greatest(lit(0.0d), acc - x - lit(k))), 6).as("cusum_neg"))
      .withColumn("alarm",
        col("cusum_pos") > lit(h) || col("cusum_neg") > lit(h))
      .orderBy("event_type", "d")
  }

  /** q_cusum: [[cusum]] with the conventional k=0.5, h=5. */
  def qCusum(spark: SparkSession, dir: String): DataFrame =
    cusum(Tables.events(spark, dir))

  /** Two-proportion z-test between two user cohorts: conversion =
    * "user has ≥1 event satisfying `convExpr`", compared across the
    * variant assignment with the pooled-variance z statistic
    * `z = (p₁−p₂) / sqrt(p̂(1−p̂)(1/n₁+1/n₂))` and the 1.96 two-sided
    * significance cut — the experiment readout every event store
    * ships. All inputs are exact integer counts; the z expression is
    * one shared division/sqrt tree, so both engines agree bitwise.
    *
    * Scale: one per-user reduction (partial-agg on user_id), then a
    * 2-row aggregate — no joins at data size. `variantExpr` is any
    * deterministic user→variant rule (hash-bucketing in production;
    * parity here). */
  def abTest(events: DataFrame, variantExpr: org.apache.spark.sql.Column,
             convExpr: org.apache.spark.sql.Column): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(when(convExpr, 1).otherwise(0)).as("conv"))
      .withColumn("variant", variantExpr)
    val agg = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    val a = agg.filter(col("variant") === "A")
      .select(col("n").as("n_a"), col("k").as("k_a"))
    val b = agg.filter(col("variant") === "B")
      .select(col("n").as("n_b"), col("k").as("k_b"))
    a.crossJoin(b) // two 1-row sides
      .withColumn("p_a", col("k_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("k_b").cast("double") / col("n_b"))
      .withColumn("p_pool",
        (col("k_a") + col("k_b")).cast("double") / (col("n_a") + col("n_b")))
      // degenerate guard: p̂ ∈ {0, 1} (nobody / everybody converts)
      // zeroes the pooled variance — report z = 0, don't divide by it
      // (this build's ANSI mode faults even DOUBLE division by zero)
      .withColumn("z",
        when(col("p_pool") === 0.0 || col("p_pool") === 1.0, lit(0.0))
          .otherwise((col("p_a") - col("p_b"))
            / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
                   * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
      .select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("z"), 6).as("z"),
        (abs(round(col("z"), 6)) > 1.96).as("significant"))
  }

  /** q_ab_test: [[abTest]] with the parity variant rule and
    * "high-value purchase" conversion (plain purchase saturates to
    * p̂ = 1 on this fixture — no variance to test). */
  def qAbTest(spark: SparkSession, dir: String): DataFrame =
    abTest(Tables.events(spark, dir),
           when(col("user_id") % 2 === 0, "A").otherwise("B"),
           col("event_type") === "purchase" && col("value") > 90)

  /** Exact ROC AUC of a (score, label) frame — the tie-corrected
    * Mann-Whitney formulation: AUC = P(score⁺ > score⁻) +
    * ½·P(score⁺ = score⁻), evaluated WITHOUT enumerating pairs from
    * per-distinct-score (pos, neg) counts: num2 = Σ_v pos_v ·
    * (2·negBelow_v + neg_v), AUC = num2 / (2·n_pos·n_neg). One row
    * (n_pos, n_neg, auc); an all-one-class input reports the
    * uninformative 0.5, not a division by zero.
    *
    * Integer-exact discipline: num2 and the denominator ride
    * DECIMAL(38,0) (pair counts overflow longs at ~10⁵ docs of each
    * class squared... at ~3·10⁹ each), so the ONE double division
    * happens on identical operands in both engines.
    *
    * Scale: one (score) count reduction (map-side combined), then the
    * [[Curation.tokenBudget]] banded two-level prefix sum over
    * DISTINCT scores (score-band partitioned windows, ≤51-row band
    * offsets broadcast back) — a near-continuous score means
    * ~corpus-many distinct values, so a global Window.orderBy here
    * would be the classic single-partition killer. Bands come from
    * [[Curation.withBoundedBand]] (min-max normalized), so the ≤51
    * bound holds for ANY score domain — probabilities, logits, raw
    * counts — not just [0,1] (r10 advice). */
  def auc(scored: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val vc = scored.groupBy(col("score").as("s"))
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
           sum(when(col("label"), 0L).otherwise(1L)).as("neg"))
    val banded = Curation.withBoundedBand(vc, "s", "sb")
    val wIn = Window.partitionBy("sb").orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = banded.withColumn("cneg_in",
      coalesce(sum(col("neg")).over(wIn), lit(0L)))
    val bands = banded.groupBy("sb").agg(sum(col("neg")).as("bneg"))
      .withColumn("boff",
        coalesce(sum(col("bneg")).over(
          Window.orderBy(col("sb").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("sb", "boff")
    within.join(broadcast(bands), "sb")
      .select(col("pos"), col("neg"),
        (dec(col("pos")) *
          (dec(col("boff") + col("cneg_in")) * 2 + dec(col("neg"))))
          .as("t"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
           sum(col("t")).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(0.5))
          .otherwise(round(col("num2").cast("double") /
            (dec(col("n_pos")) * dec(col("n_neg")) * 2).cast("double"), 6))
          .as("auc"))
  }

  /** q_auc: does the quality composite separate DUPLICATED content
    * (md5 group size > 1 — the planted near-free label every corpus
    * has) from unique content? Score = quality, label = duplicated. */
  def qAuc(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val labeled = h.join(
        h.groupBy("h").agg(count(lit(1)).as("gn")), "h")
      .select(col("doc_id"), (col("gn") > 1L).as("label"))
    val q = TextAnalysis.qualityFromStats(
        TextAnalysis.corpusQualityStats(spark, dir))
      .select(col("doc_id"), col("quality").as("score"))
    auc(q.join(labeled, "doc_id").select(col("score"), col("label")))
  }
}
