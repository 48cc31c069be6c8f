package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Categorical association profile between two columns — the
    * "is my corpus biased" readout (is `lang` independent of
    * `source`?): the full contingency table with, per cell, the
    * expected count under independence, the χ² contribution, and the
    * mutual-information contribution (nats), plus the χ² total,
    * MI total, and Cramér's V repeated on every row.
    *
    * Scale design: ONE partial-agg shuffle reduces the corpus to the
    * contingency cells; everything downstream (margins via joins,
    * totals) runs on the cell table, bounded by |A|·|B| categories —
    * corpus-size-independent. The margin/total joins are 1-to-few-row
    * sides that AQE broadcasts.
    *
    * Determinism: cells/margins are exact integers, so each cell term
    * is the same double on both engines (ln on identical arguments).
    * The TOTALS sum the 6-dp-ROUNDED terms in integer micro-units
    * (DECIMAL(38,0)) — order-independent by construction, so the
    * global χ²/MI/V cannot flip with partitioning, and V comes off an
    * exact double via IEEE sqrt. */
  def assocStats(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    // densify to the full |A|x|B| grid: χ² counts UNOBSERVED cells
    // too ((0−e)²/e = e), and dropping them understates dependence —
    // a perfectly dependent 2×2 would read 62.5 instead of N. The
    // grid is category-cardinality-bounded, so the cross join is a
    // dims-only product, never data-sized.
    val cells = obs.select("a").distinct()
      .crossJoin(obs.select("b").distinct())
      .join(obs, Seq("a", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val ma = cells.groupBy("a").agg(sum("n").as("na"))
    val mb = cells.groupBy("b").agg(sum("n").as("nb"))
    val tot = cells.agg(sum(col("n")).as("nn"),
                        countDistinct(col("a")).as("ra"),
                        countDistinct(col("b")).as("rb"))
    val t = cells.join(ma, "a").join(mb, "b").crossJoin(tot) // 1-row side
      .withColumn("expected",
        col("na").cast("double") * col("nb") / col("nn"))
      .withColumn("chi2_term",
        round((col("n") - col("expected")) * (col("n") - col("expected"))
          / col("expected"), 6))
      .withColumn("mi_term",
        // double carriers throughout: na*nb as longs would overflow
        // beyond ~1e9 total rows; empty cells contribute 0 (the
        // n→0 limit of n/N·ln n)
        when(col("n") === 0, lit(0.0d)).otherwise(
          round(col("n").cast("double") / col("nn")
            * log(col("n").cast("double") * col("nn")
                  / (col("na").cast("double") * col("nb"))), 6)))
    val totals = t.agg(
      (sum(round(col("chi2_term") * 1e6).cast("decimal(38,0)")).cast("double") / 1e6)
        .as("chi2_total"),
      (sum(round(col("mi_term") * 1e6).cast("decimal(38,0)")).cast("double") / 1e6)
        .as("mi_total"),
      first(col("nn")).as("nn0"),
      first(least(col("ra"), col("rb"))).as("minrc"))
      .select(col("chi2_total"), col("mi_total"),
        // single-category input: min(R,C) = 1 zeroes the denominator
        // (and χ² is definitionally 0) — report V = 0, don't divide
        when(col("minrc") <= 1, lit(0.0)).otherwise(
          round(sqrt(col("chi2_total") / (col("nn0") * (col("minrc") - 1))), 6))
          .as("cramers_v"))
    t.select(col("a"), col("b"), col("n"),
             round(col("expected"), 6).as("expected"),
             col("chi2_term"), col("mi_term"))
      .crossJoin(totals) // 1-row side
      .orderBy("a", "b")
  }

  /** q_assoc_stats: [[assocStats]] of documents.lang × documents.source. */
  def qAssocStats(spark: SparkSession, dir: String): DataFrame =
    assocStats(Tables.documents(spark, dir), "lang", "source")

  /** Winsorization report: per group, the [lo, hi] quantile clip
    * bounds of `valCol`, how many rows each side clips, and the mean
    * before/after — the outlier-taming readout a feature pipeline
    * checks before normalizing a heavy-tailed column.
    *
    * Scale: one percentile aggregate per group (single shuffle), the
    * bounds joined back by BROADCAST (group-cardinality rows), one
    * more partial-agg pass for the clipped stats. Means ride
    * cent-rounded DECIMAL(38,0) carriers — the clipped mean is
    * DEFINED as the mean of cent-rounded clipped values, so both
    * engines sum identical integers in any order. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"winsorize: bad bounds [$lo, $hi]")
    val g = col(groupCol)
    val v = col(valCol)
    val bounds = df.groupBy(g.as("__w_grp"))
      .agg(expr(s"percentile($valCol, $lo)").as("p_lo"),
           expr(s"percentile($valCol, $hi)").as("p_hi"))
    val clipped = least(greatest(v, col("p_lo")), col("p_hi"))
    df.join(broadcast(bounds), g === col("__w_grp")).drop("__w_grp")
      .groupBy(g)
      .agg(
        first(col("p_lo")).as("lo_raw"),
        first(col("p_hi")).as("hi_raw"),
        count(lit(1)).as("n"),
        sum(when(v < col("p_lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(v > col("p_hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(round(v * 100).cast("decimal(38,0)")).as("sb"),
        sum(round(clipped * 100).cast("decimal(38,0)")).as("sa"))
      .select(g, round(col("lo_raw"), 6).as("p_lo"),
        round(col("hi_raw"), 6).as("p_hi"),
        col("n"), col("n_clip_lo"), col("n_clip_hi"),
        round(col("sb").cast("double") / 100 / col("n"), 6).as("mean_before"),
        round(col("sa").cast("double") / 100 / col("n"), 6).as("mean_after"))
      .orderBy(groupCol)
  }

  /** q_winsorize: [[winsorize]] of l_extendedprice per returnflag at
    * [p05, p95]. */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame =
    winsorize(Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice")

  /** Benford first-digit audit of a positive numeric column — the
    * classic fabricated-data / unit-mix smoke test: observed
    * first-significant-digit shares against Benford's log₁₀(1+1/d)
    * expectation, with per-digit χ² contributions.
    *
    * The digit comes from the DECIMAL(18,2) string rendering (both
    * engines print decimals identically), NOT from floor(log10):
    * libm log10 at exact powers of ten is implementation-defined in
    * the last ulp and could misclassify 100.00. One partial-agg
    * count shuffle; everything after is 9 rows. */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    val digit = substring(col(valCol).cast("decimal(18,2)").cast("string"), 1, 1)
      .cast("int")
    val counts = df.filter(col(valCol) >= 1)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("nn"))
    val e = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
    counts.crossJoin(total) // 1-row side
      .withColumn("share", round(col("n").cast("double") / col("nn"), 6))
      .withColumn("expected", round(e, 6))
      // chi2 on the EXACT expectation, not the rounded display
      // column: (o − e·N)²/(e·N); squared by multiply, not libm pow
      .withColumn("chi2_term",
        round((col("n") - e * col("nn")) * (col("n") - e * col("nn"))
          / (e * col("nn")), 6))
      .select("digit", "n", "share", "expected", "chi2_term")
      .orderBy("digit")
  }

  /** q_benford: [[benford]] over o_totalprice. */
  def qBenford(spark: SparkSession, dir: String): DataFrame =
    benford(Tables.orders(spark, dir), "o_totalprice")

  /** Gini concentration coefficient of a non-negative cent-exact
    * metric per group — "do 1% of the users drive 99% of the value",
    * the inequality readout next to [[keySkew]]'s join-key version.
    * Rank formula on the ascending (value, id) total order:
    * `G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n` — every sum an exact
    * DECIMAL(38,0) over integers, the final expression one division
    * tree both engines share.
    *
    * Scale: one per-entity reduction, then a rank over entities. The
    * within-group rank uses a keyed window (one shuffle on the
    * group); Σ i·xᵢ is a partial-agg decimal sum. */
  def gini(df: DataFrame, groupCol: String, idCol: String,
           valCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(valCol).asc, col(idCol).asc)
    df.select(col(groupCol), col(idCol), col(valCol),
        round(col(valCol) * 100).cast("decimal(38,0)").as("xc"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
           sum(col("xc")).as("sx"),
           sum(col("xc") * col("rk").cast("decimal(19,0)")).as("six"))
      .select(col(groupCol), col("n"),
        round(col("sx").cast("double") / 100, 2).as("total"),
        round(
          lit(2.0) * col("six").cast("double") / (col("n") * col("sx").cast("double"))
            - (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
      .orderBy(groupCol)
  }

  /** q_gini: [[gini]] of per-user purchase value within each event
    * type — concentration of spend. */
  def qGini(spark: SparkSession, dir: String): DataFrame =
    gini(Tables.events(spark, dir)
           .groupBy(col("event_type"), col("user_id"))
           .agg((sum(round(col("value") * 100).cast("decimal(38,0)"))
                  .cast("double") / 100).as("v")),
         "event_type", "user_id", "v")

  /** Join-key skew profile of one or more key columns — the readout
    * that decides salting/AQE-skew handling before a 100 TB join:
    * per column, row count, distinct keys, the share carried by the
    * heaviest key and the top 10, Shannon entropy of the key
    * distribution, and the effective key count `exp(H)`.
    *
    * Entropy is DEFINED on integer micro-unit carriers
    * (Σ round(c·ln c·10⁶) as DECIMAL) so the vocabulary-scale sum is
    * order-independent — same discipline as the assoc/modularity
    * totals; `H = ln N − Σc·ln c / N` needs no per-key division.
    *
    * Scale: one partial-agg count per column over a single-column
    * pruned scan; top-k via a count-ordered limit (TakeOrdered), the
    * entropy sum a 1-row decimal aggregate. */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "keySkew: need at least one column")
    cols.map { c =>
      val counts = df.select(col(c)).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        (sum(round(col("cnt").cast("double") * log(col("cnt").cast("double")) * 1e6)
          .cast("decimal(38,0)")).cast("double") / 1e6).as("slnc"))
      val top = counts.orderBy(col("cnt").desc, col(c).asc).limit(10)
        .agg(max(col("cnt")).as("top1"), sum(col("cnt")).as("top10"))
      tot.crossJoin(top) // two 1-row sides
        .select(lit(c).as("key_col"), col("n_rows"), col("n_keys"),
          round(col("top1").cast("double") / col("n_rows"), 6).as("top1_share"),
          round(col("top10").cast("double") / col("n_rows"), 6).as("top10_share"),
          round(log(col("n_rows").cast("double"))
            - col("slnc") / col("n_rows"), 6).as("entropy"),
          round(exp(log(col("n_rows").cast("double"))
            - col("slnc") / col("n_rows")), 6).as("eff_keys"))
    }.reduce(_ unionAll _).orderBy("key_col")
  }

  /** q_key_skew: [[keySkew]] of the lineitem join keys. */
  def qKeySkew(spark: SparkSession, dir: String): DataFrame =
    keySkew(Tables.lineitem(spark, dir),
            Seq("l_orderkey", "l_partkey", "l_suppkey"))

  /** Smoothed target encoding of a categorical column — the
    * leakage-aware ML feature: per category,
    * `enc = (Σtarget + m·prior) / (n + m)` with the global mean as
    * prior, so rare categories shrink toward it. Cent-exact integer
    * sums; one shared division tree; the prior is computed from the
    * SAME exact totals.
    *
    * Scale: one partial-agg reduction to category cardinality + a
    * 1-row global aggregate. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   m: Double = 100.0): DataFrame = {
    val cents = round(col(targetCol) * 100).cast("decimal(38,0)")
    val per = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"))
    val glob = per.agg(sum(col("n")).as("gn"), sum(col("sc")).as("gsc"))
    per.crossJoin(glob) // 1-row side
      .withColumn("prior", col("gsc").cast("double") / 100 / col("gn"))
      .select(col(catCol), col("n"),
        round(col("sc").cast("double") / 100 / col("n"), 6).as("cat_mean"),
        round(col("prior"), 6).as("prior"),
        round((col("sc").cast("double") / 100 + lit(m) * col("prior"))
          / (col("n") + lit(m)), 6).as("encoded"))
      .orderBy(catCol)
  }

  /** q_target_encoding: [[targetEncode]] of p_brand against
    * l_extendedprice (part joined to lineitem). */
  def qTargetEncoding(spark: SparkSession, dir: String): DataFrame =
    targetEncode(
      Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
                .select("p_partkey", "p_brand")),
              col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_extendedprice")),
      "p_brand", "l_extendedprice")

  /** Population Stability Index between a reference and a current
    * sample of a numeric column — the drift monitor every deployed
    * model runs: 10 buckets from the REFERENCE deciles, Laplace-
    * smoothed shares ((c+1)/(n+10), so empty buckets stay finite),
    * per-bucket `(p−q)·ln(p/q)` contributions and the
    * order-independent micro-unit total. PSI < 0.1 stable, > 0.25
    * action.
    *
    * Determinism: decile edges are `percentile` ≡ `quantile_cont`
    * doubles; bucket assignment is `1 + Σ(v > edge)` on identical
    * comparisons; counts integers. Scale: one percentile pass over
    * the reference, one bucket-count reduction per side, 10-row
    * report. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valCol: String): DataFrame = {
    val es = (1 to 9).map(d => expr(s"percentile($valCol, 0.${d})").as(s"e$d"))
    val edges = ref.agg(es.head, es.tail: _*)
    def bucketed(df: DataFrame) = df.crossJoin(edges) // 1-row side
      .select((lit(1) + (1 to 9).map(d =>
        when(col(valCol) > col(s"e$d"), 1).otherwise(0)).reduce(_ + _))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val r = bucketed(ref).withColumnRenamed("c", "c_ref")
    val c = bucketed(cur).withColumnRenamed("c", "c_cur")
    val grid = ref.sparkSession.range(1, 11).select(col("id").cast("int").as("bucket"))
    val tot = r.agg(sum(col("c_ref")).as("n_ref"))
      .crossJoin(c.agg(sum(col("c_cur")).as("n_cur")))
    val t = grid.join(r, Seq("bucket"), "left").join(c, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_ref", "c_cur"))
      .crossJoin(tot) // 1-row side
      .withColumn("p", (col("c_ref") + 1).cast("double") / (col("n_ref") + 10))
      .withColumn("q", (col("c_cur") + 1).cast("double") / (col("n_cur") + 10))
      .withColumn("psi_term",
        round((col("p") - col("q")) * log(col("p") / col("q")), 6))
    val total = t.agg(
      (sum(round(col("psi_term") * 1e6).cast("decimal(38,0)")).cast("double") / 1e6)
        .as("psi"))
    t.select(col("bucket"), col("c_ref"), col("c_cur"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        col("psi_term"))
      .crossJoin(total) // 1-row side
      .orderBy("bucket")
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic, each source vs
    * the REST of the corpus, over an integer-valued per-doc statistic
    * (token count here) — the nonparametric complement to
    * [[psiDrift]]'s binned PSI: no binning choice, exact D.
    * Reports (source, n_src, n_rest, ks_at, ks_d): D = max over
    * values x of |ECDF_src(x) − ECDF_rest(x)|, ks_at the smallest x
    * attaining it.
    *
    * Integer-exact discipline: with integer values the ECDF gap is
    * the rational |cum_src·n_rest − cum_rest·n_src| / (n_src·n_rest);
    * the numerator is carried as DECIMAL(38,0) (cum·n products
    * overflow longs at ~1e10 docs), so max-finding and the tie-break
    * are exact integer comparisons on both engines, and the one
    * double division happens once on identical operands.
    *
    * Scale: one (source, value) count reduce (map-side combined), a
    * bounded grid of |sources| × |distinct values| (both bounded —
    * values are doc token counts, capped by max doc length, NOT
    * corpus-sized), per-source window cumsums over that bounded grid,
    * and a per-source max. Nothing corpus-sized passes a window. */
  def ksBySource(perDoc: DataFrame, valCol: String = "n_toks"): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val vc = perDoc.groupBy(col("source"), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val perVal = vc.groupBy("v").agg(sum(col("c")).as("ct"))
    // every (source, value) grid cell: the per-source partition then
    // holds EVERY distinct value once, so the same per-source window
    // yields both cum_src and the global cum — no global window.
    // ALL per-source scalars ride that one source partitioning too
    // (r17): n_src = Σc and n_all = Σct over the full source
    // partition (each partition holds every value once, so Σct is the
    // corpus total), and the D-maximum is a window max — the separate
    // srcTot/allTot aggregates, their join-backs, and the max+rejoin
    // pass (5 exchanges of a 21-job query) fold into the window stage
    // on identical integer operands.
    val grid = vc.select("source").distinct()
      .crossJoin(vc.select("v").distinct())
    val w = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSrc = Window.partitionBy("source")
    val t = grid.join(vc, Seq("source", "v"), "left").na.fill(0L, Seq("c"))
      .join(perVal, "v")
      .withColumn("cum_src", sum(col("c")).over(w))
      .withColumn("cum_all", sum(col("ct")).over(w))
      .withColumn("n_src", sum(col("c")).over(wSrc))
      .withColumn("n_all", sum(col("ct")).over(wSrc))
      .withColumn("n_rest", col("n_all") - col("n_src"))
      .withColumn("num",
        abs(dec(col("cum_src")) * dec(col("n_rest")) -
            dec(col("cum_all") - col("cum_src")) * dec(col("n_src"))))
      .withColumn("num_max", max(col("num")).over(wSrc))
    t.filter(col("num") === col("num_max"))
      .groupBy(col("source"))
      .agg(first(col("n_src")).as("n_src"),
           first(col("n_rest")).as("n_rest"),
           min(col("v")).as("ks_at"),
           first(col("num_max")).as("num_max"))
      // single-source corpus: n_rest = 0 -> D is undefined; report 0
      .select(col("source"), col("n_src"), col("n_rest"), col("ks_at"),
        when(col("n_rest") === 0L, lit(0.0)).otherwise(
          round(col("num_max").cast("double") /
                  (col("n_src") * col("n_rest")).cast("double"), 6))
          .as("ks_d"))
      .orderBy("source")
  }

  /** q_ks_test: [[ksBySource]] over per-document token counts from
    * the materialized quality-stats table. */
  def qKsTest(spark: SparkSession, dir: String): DataFrame =
    ksBySource(TextAnalysis.corpusQualityStats(spark, dir)
                 .select(col("source"), col("n_toks")))

  /** q_psi_drift: [[psiDrift]] of event value, first half of the
    * month (day ≤ 15) as reference vs the rest as current. */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("value"), dayofmonth(col("ts")).as("dom"))
    psiDrift(e.filter(col("dom") <= 15), e.filter(col("dom") > 15), "value")
  }

  /** Exact join-cardinality prediction — the planner diagnostic that
    * pairs with [[keySkew]]: the equi-join's output size is EXACTLY
    * `Σ_k c_left(k)·c_right(k)`, computable from the two key-count
    * tables (each a partial-agg reduction) without running the join.
    * Reports predicted rows, both sides' totals/distinct keys, the
    * overlap key count, and the single heaviest key's contribution —
    * the number that says "salt this" before a 100 TB shuffle.
    *
    * The verification column `actual_rows` (the real join count)
    * makes the query self-checking; a production caller reads only
    * the prediction side. */
  def joinCardinality(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String,
                      withActual: Boolean = true): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    val j = lc.join(rc, "k")
      .select(col("k"), (col("cl") * col("cr")).as("contrib"))
    val pred = j.agg(
      sum(col("contrib")).as("predicted_rows"),
      count(lit(1)).as("overlap_keys"),
      max(col("contrib")).as("max_key_contrib"))
    val sides = lc.agg(sum("cl").as("n_left"), count(lit(1)).as("keys_left"))
      .crossJoin(rc.agg(sum("cr").as("n_right"), count(lit(1)).as("keys_right")))
    val base = pred.crossJoin(sides) // 1-row sides
    val out = if (withActual) {
      val actual = left.join(right, col(leftKey) === col(rightKey))
        .agg(count(lit(1)).as("actual_rows"))
      base.crossJoin(actual)
    } else base.withColumn("actual_rows", col("predicted_rows"))
    out.select(col("n_left"), col("keys_left"), col("n_right"),
      col("keys_right"), col("overlap_keys"), col("predicted_rows"),
      col("max_key_contrib"), col("actual_rows"))
  }

  /** q_join_cardinality: [[joinCardinality]] of orders ⨝ lineitem on
    * the order key, with the actual count as the in-query check. */
  def qJoinCardinality(spark: SparkSession, dir: String): DataFrame =
    joinCardinality(Tables.orders(spark, dir), "o_orderkey",
                    Tables.lineitem(spark, dir), "l_orderkey")

  /** Equi-depth binning report of a numeric column against a target —
    * the "feature vs target" table read before any model fit: decile
    * edges from `percentile`, per-bin row count and cent-exact target
    * mean. Bin edges are shared-quantile doubles; assignment is the
    * same `1 + Σ(v > edge)` comparison chain on both engines.
    *
    * Scale: one percentile pass + one binned reduction; the report is
    * 10 rows. */
  def quantileBins(df: DataFrame, valCol: String, targetCol: String): DataFrame = {
    val es = (1 to 9).map(d => expr(s"percentile($valCol, 0.${d})").as(s"e$d"))
    val edges = df.agg(es.head, es.tail: _*)
    df.crossJoin(edges) // 1-row side
      .select(
        (lit(1) + (1 to 9).map(d =>
          when(col(valCol) > col(s"e$d"), 1).otherwise(0)).reduce(_ + _))
          .as("bin"),
        col(valCol).as("v"), col(targetCol).as("t"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
           round(min(col("v")), 6).as("v_min"),
           round(max(col("v")), 6).as("v_max"),
           (sum(round(col("t") * 100).cast("decimal(38,0)"))
             .cast("double") / 100).as("ts"))
      .select(col("bin"), col("n"), col("v_min"), col("v_max"),
              round(col("ts") / col("n"), 6).as("target_mean"))
      .orderBy("bin")
  }

  /** q_quantile_bins: [[quantileBins]] of l_quantity vs
    * l_extendedprice — price read along quantity deciles. */
  def qQuantileBins(spark: SparkSession, dir: String): DataFrame =
    quantileBins(Tables.lineitem(spark, dir), "l_quantity", "l_extendedprice")

  /** Equi-width 2-D histogram — the heatmap feed: fixed-width cells
    * over two numeric columns with count and cent-exact mean of a
    * measure per cell. Cell ids are `floor(v / width)` on identical
    * doubles (exact for the in-range magnitudes both engines see);
    * one partial-agg reduction, report rows = occupied cells.
    *
    * Deliberately equi-WIDTH (the [[quantileBins]] complement):
    * heatmaps want stable, interpretable cell edges, not data-driven
    * ones. */
  def histogram2d(df: DataFrame, xCol: String, xWidth: Double,
                  yCol: String, yWidth: Double,
                  measureCol: String): DataFrame = {
    val bx = floor(col(xCol) / xWidth).cast("long")
    val by = floor(col(yCol) / yWidth).cast("long")
    df.groupBy(bx.as("bx"), by.as("by"))
      .agg(count(lit(1)).as("n"),
           (sum(round(col(measureCol) * 100).cast("decimal(38,0)"))
             .cast("double") / 100).as("ms"))
      .select(col("bx"), col("by"),
        round(col("bx") * xWidth, 6).as("x_lo"),
        round(col("by") * yWidth, 6).as("y_lo"),
        col("n"), round(col("ms") / col("n"), 6).as("measure_mean"))
      .orderBy("bx", "by")
  }

  /** q_histogram_2d: [[histogram2d]] of quantity × discount with the
    * mean extended price per cell. */
  def qHistogram2d(spark: SparkSession, dir: String): DataFrame =
    histogram2d(Tables.lineitem(spark, dir), "l_quantity", 10.0,
                "l_discount", 0.02, "l_extendedprice")

  /** Index of dispersion (Fano factor, variance/mean) of the daily
    * event counts per type — the burstiness diagnostic: ≈1 Poisson,
    * ≫1 bursty, <1 regular. Population variance from exact integer
    * Σn/Σn² over the zero-filled span. */
  def burstiness(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
    val filled = daily.groupBy("event_type")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
      .join(daily, Seq("event_type", "d"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    filled.groupBy("event_type")
      .agg(count(lit(1)).as("days"),
           sum(col("n").cast("decimal(38,0)")).as("s1"),
           sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)"))
             .as("s2"))
      .withColumn("mu", col("s1").cast("double") / col("days"))
      .select(col("event_type"), col("days"),
        round(col("mu"), 6).as("mean_daily"),
        when(col("mu") === 0.0, lit(0.0)).otherwise(
          round((col("s2").cast("double") / col("days")
                 - col("mu") * col("mu")) / col("mu"), 6)).as("fano"))
      .orderBy("event_type")
  }

  /** q_burstiness: [[burstiness]] of the event stream. */
  def qBurstiness(spark: SparkSession, dir: String): DataFrame =
    burstiness(Tables.events(spark, dir))
}
