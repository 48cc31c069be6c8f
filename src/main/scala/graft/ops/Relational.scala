package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational core: scans/projections, predicates, the full join family,
  * sorts and set operations (SURVEY.md §2.2). All plain DataFrame DSL —
  * Catalyst owns pushdown/pruning/join selection (§4.2); the only manual
  * hints are `broadcast()` on bounded dimension tables, which is the
  * 100 TB-correct choice (nation/region are O(100) rows at any scale).
  */
object Relational {

  /** q_scan_project: parquet scan + projection + limit. Column pruning
    * must reach the scan (ReadSchema carries only 4 of 11 columns). */
  def qScanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
      // order by the full output tuple for determinism.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(100)

  /** q_source_roundtrip: the CSV/JSON source+sink pair (r12 — the
    * interchange formats next to the parquet at-rest path): the
    * documents' scalar columns are WRITTEN to csv (header) and json
    * on the executors, read back with explicit schemas (never inferred
    * — schema inference is an extra full scan and a type lottery; at
    * 100 TB the contract is always a declared schema), and both
    * round-trips are aggregated side by side. Lossless for
    * long/simple-string columns, so the oracle is the same aggregate
    * straight off the parquet table — the compare proves write→read
    * identity per format, not just that the code ran. Temp output is
    * per-(JVM, corpus) content-keyed via [[graft.ops.IndexCache]] —
    * rebuilt iff the corpus changed, exactly like the dedup indexes. */
  def qSourceRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = sourceRoundtripPaths.get(spark, dir)
    val schema = "doc_id BIGINT, lang STRING, n_chars BIGINT"
    // Null/empty/whitespace discipline (r13, advisor): Spark CSV by
    // default writes null and "" identically and trims cell whitespace
    // on write — values outside this corpus would silently fail the
    // "lossless" claim. A distinct null sentinel (\N, the classic
    // mysqldump convention) plus whitespace-preserving write options
    // make the round trip lossless for ALL string values, not just the
    // ones the test corpus happens to contain.
    val csv = spark.read.option("header", "true").schema(schema)
      .option("nullValue", "\\N")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(s"$base/docs_csv")
      .select(lit("csv").as("fmt"), col("doc_id"), col("lang"), col("n_chars"))
    val json = spark.read.schema(schema).json(s"$base/docs_json")
      .select(lit("json").as("fmt"), col("doc_id"), col("lang"), col("n_chars"))
    csv.unionAll(json)
      .groupBy("fmt", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("fmt", "lang")
  }

  private val sourceRoundtripPaths =
    new IndexCache[String]("documents", { (spark, d) =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_source_rt").toString
      val docs = Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(s"$p/docs_csv")
      docs.write.mode("overwrite").json(s"$p/docs_json")
      p
    })

  /** q_partition_prune: the partitioned-sink + pruned-source pair —
    * the layout decision that matters most at 100 TB: documents are
    * written `partitionBy(lang)` (the at-rest form for any
    * language-sliced corpus), and the read-back filters one lang.
    * Catalyst turns the filter into a PARTITION filter — the scan
    * touches one directory, not the corpus; PlanShapeSpec pins
    * `PartitionFilters` non-empty so a regression to a full scan
    * fails the suite, not the cluster bill. Oracle: the same
    * aggregate off the unpartitioned table with the same filter. */
  def qPartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val base = partitionedDocsPaths.get(spark, dir)
    graft.Tables.loadPath(spark, base)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")
  }

  private val partitionedDocsPaths =
    new IndexCache[String]("documents", { (spark, d) =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_part_docs").toString + "/docs"
      Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(p)
      p
    })

  /** q_filter_pred: compound predicate — AND/OR, BETWEEN, IN, LIKE,
    * null-safe equality — all pushable to the parquet scan. */
  def qFilterPred(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        (col("l_returnflag").isin("A", "R")
          && col("l_quantity").between(5, 15)
          && col("l_linestatus").like("F%"))
        || (col("l_discount") <= 0.01 && col("l_tax") > 0.07)
        || (col("l_partkey") <=> 42))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
              "l_discount", "l_tax")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
               "l_discount", "l_tax")

  /** q_join_inner: equi inner join, Spark's strategy choice (SMJ/SHJ
    * under AQE at scale; both sides shuffle on the key). */
  def qJoinInner(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** q_join_broadcast: star join against the two bounded dims —
    * explicitly broadcast so no shuffle of the fact side ever happens
    * regardless of statistics. */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  /** q_join_left: left outer + null-aware aggregation (customers with
    * zero orders must appear with n_orders=0). */
  def qJoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey").as("c_custkey"))
      .agg(
        count(o("o_orderkey")).as("n_orders"),
        round(coalesce(sum(o("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** q_join_semi: EXISTS — customers with at least one big order. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** q_join_anti: NOT EXISTS — customers with no big order. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** q_join_theta: equi join + non-equi residual (shipped strictly after
    * the order date), aggregated down. */
  def qJoinTheta(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey")
              && l("l_shipdate") > o("o_orderdate"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_extendedprice")), 2).as("rev"))
      .orderBy("l_returnflag")
  }

  /** q_join_range: pure interval join — events binned against value
    * bands. The bands side is a tiny literal relation, broadcast; Spark
    * plans BroadcastNestedLoopJoin, which is exactly right (the
    * alternative — shuffling 100 TB of events for 4 bands — is not).
    */
  def qJoinRange(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val bands = spark.createDataFrame(Seq(
      ("b0_low", 0.0, 100.0),
      ("b1_mid", 100.0, 200.0),
      ("b2_high", 200.0, 300.0),
      ("b3_top", 300.0, 500.0),
    )).toDF("band", "lo", "hi")
    e.join(broadcast(bands), e("value") >= bands("lo") && e("value") < bands("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .orderBy("band")
  }

  /** q_join_asof: each purchase matched to the latest prior-or-equal
    * signup of the same user. Spark has no native as-of join; the
    * scalable pattern is union-tag + `last(_, ignoreNulls)` over a
    * (user, time)-ordered window — one shuffle on user_id, no
    * per-row subquery, no driver state (SURVEY.md §2.2).
    */
  def qJoinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select("event_id", "user_id", "ts", "event_type")
    // signup sorts before purchase at equal ts (desc on event_type) so an
    // exactly-simultaneous signup is visible to the purchase (>= join).
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_type").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("sig_ts", when(col("event_type") === "signup", col("ts")))
      .withColumn("signup_ts", last(col("sig_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("signup_ts").isNotNull)
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  /** q_join_asof_native: the same as-of semantics as [[qJoinAsof]] but
    * through graft's first-class plan node ([[graft.plans.AsOfJoin]] →
    * `AsOfJoinExec` merge scan) instead of the union+window encoding —
    * both run against the identical DuckDB `ASOF JOIN` oracle. */
  def qJoinAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("su_user"), col("ts").as("signup_ts"))
    graft.plans.AsOfJoins
      .asof(purchases, signups, "user_id", "su_user", "ts", "signup_ts")
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  /** q_join_asof_left: LEFT-OUTER as-of through the native plan node —
    * every purchase kept, matched to the latest prior-or-equal signup
    * when one exists, null signup_ts otherwise (the trade/quote shape:
    * a trade with no quote yet still survives). Same DuckDB
    * `ASOF LEFT JOIN` oracle discipline as the inner form. */
  def qJoinAsofLeft(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("su_user"), col("ts").as("signup_ts"))
    graft.plans.AsOfJoins
      .asof(purchases, signups, "user_id", "su_user", "ts", "signup_ts",
            org.apache.spark.sql.catalyst.plans.LeftOuter)
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  private def asofSides(spark: SparkSession, dir: String) = {
    val ev = Tables.events(spark, dir)
    (ev.filter(col("event_type") === "purchase")
         .select("event_id", "user_id", "ts"),
     ev.filter(col("event_type") === "signup")
       .select(col("user_id").as("su_user"), col("ts").as("signup_ts")))
  }

  /** q_join_asof_tol: backward as-of with a max-gap TOLERANCE — a
    * purchase only matches a signup at most 1 day older (the
    * staleness bound users of asof APIs reach for next: a quote older
    * than the bound should not price the trade). Inner semantics: an
    * out-of-tolerance match is NO match and the row drops. Tolerance
    * is in the ts column's internal units — micros for timestamps.
    * Oracle: DuckDB `ASOF JOIN` + a residual gap filter (backward
    * match first, bound second — the same order the exec applies). */
  def qJoinAsofTol(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, signups) = asofSides(spark, dir)
    graft.plans.AsOfJoins
      .asof(purchases, signups, "user_id", "su_user", "ts", "signup_ts",
            tolerance = Some(86400e6 /* 1 day in micros */))
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  /** q_join_asof_fwd: FORWARD as-of — each purchase matched to the
    * EARLIEST signup at-or-after it (the "next maintenance window"
    * shape). Oracle: correlated min-subquery, inner via IS NOT NULL. */
  def qJoinAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, signups) = asofSides(spark, dir)
    graft.plans.AsOfJoins
      .asof(purchases, signups, "user_id", "su_user", "ts", "signup_ts",
            direction = graft.plans.AsOfDirection.Forward)
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  /** q_join_asof_near: NEAREST as-of — whichever of the backward /
    * forward candidates is closer in absolute gap, ties to backward
    * (pandas `merge_asof` convention). Oracle: both correlated
    * extrema + a CASE choosing the closer side. */
  def qJoinAsofNear(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, signups) = asofSides(spark, dir)
    graft.plans.AsOfJoins
      .asof(purchases, signups, "user_id", "su_user", "ts", "signup_ts",
            direction = graft.plans.AsOfDirection.Nearest)
      .select("event_id", "user_id", "ts", "signup_ts")
      .orderBy("event_id")
  }

  /** q_join_skew: the hot-key fact⋈fact join through
    * [[Skew.saltedInnerJoin]] — lineitem joined to orders on the order
    * key with an 8-way salt spreading each key over 8 reducers, then
    * the revenue rollup by priority. The RESULT is provably identical
    * to the unsalted join (the oracle is the plain SQL join — salting
    * changes partitioning, never semantics), which is exactly the
    * property that makes salting safe to apply under a skewed 100 TB
    * key distribution. */
  def qJoinSkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"),
              (col("l_extendedprice") * (lit(1) - col("l_discount")))
                .as("rev"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    Skew.saltedInnerJoin(li, o, "o_orderkey", 8)
      .groupBy("o_orderpriority")
      .agg(round(sum(col("rev")), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** q_sort_multi: multi-key sort, mixed direction, explicit null
    * ordering (a NULLIF-derived key supplies real nulls). */
  def qSortMulti(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
              col("o_totalprice"),
              nullif(col("o_orderstatus"), lit("O")).as("status_n"))
      .orderBy(col("status_n").asc_nulls_first, col("o_totalprice").desc,
               col("o_orderkey").asc)
      .limit(500)

  /** q_topk: global top-k — plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k, never a full sort at scale). */
  def qTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  private def unionSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(spark, dir)
    (o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")),
     o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey")))
  }

  /** q_union_all: bag union, tagged so the output has a unique key. */
  def qUnionAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "F")
      .select(lit("f").as("src"), col("o_orderkey"), col("o_custkey"))
    val b = o.filter(col("o_totalprice") > 400000)
      .select(lit("big").as("src"), col("o_orderkey"), col("o_custkey"))
    a.unionAll(b).orderBy("src", "o_orderkey")
  }

  /** q_union_distinct: set union. */
  def qUnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = unionSides(spark, dir)
    a.union(b).distinct().orderBy("custkey")
  }

  /** q_intersect: set intersection (distinct semantics on both engines). */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = unionSides(spark, dir)
    a.intersect(b).orderBy("custkey")
  }

  /** q_except: set difference (distinct semantics on both engines). */
  def qExcept(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = unionSides(spark, dir)
    a.except(b).orderBy("custkey")
  }

  /** Interval-overlap join of two CLOSED timestamp intervals
    * [aStart, aEnd] × [bStart, bEnd] — every (a, b) pair whose
    * intervals intersect, emitted exactly once, WITHOUT the
    * cartesian/nested-loop plan a raw inequality join degenerates to
    * (Catalyst has no equi-key to hash on, so `a.s <= b.e AND b.s <=
    * a.e` alone plans BroadcastNestedLoopJoin — fine for 4 literal
    * bands in [[qJoinRange]], fatal for two large sides at 100 TB).
    *
    * Shape: both sides explode to the fixed-width epoch buckets their
    * intervals cover (`sequence` over integer-micros bucket ids — an
    * interval of length L costs ⌈L/width⌉ rows, so width should sit
    * near the typical interval length), then ONE hash equi-join on
    * the bucket id. A pair sharing k buckets would surface k times;
    * instead of a dedup shuffle, the pair is kept only in the bucket
    * containing the LATER of the two starts — the bucket where the
    * overlap begins — which each matched pair has exactly one of.
    * True overlap is then one residual predicate. Hot buckets (many
    * live intervals at once) produce m·n candidates — that is the
    * real overlap density, not an artifact; narrow the width to
    * spread genuinely long intervals.
    *
    * Both inputs must already carry disjoint column names; the
    * output is a.* ++ b.*. */
  def intervalJoin(a: DataFrame, b: DataFrame,
                   aStart: String, aEnd: String,
                   bStart: String, bEnd: String,
                   bucketWidth: String = "1 hour"): DataFrame = {
    val widthUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(bucketWidth))
      match {
        case iv =>
          require(iv.months == 0, s"intervalJoin: bucketWidth must be day-time, got $bucketWidth")
          iv.days * 86400000000L + iv.microseconds
      }
    require(widthUs > 0, s"intervalJoin: non-positive bucketWidth $bucketWidth")
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    def buckets(df: DataFrame, s: String, e: String) = df
      .withColumn("__bk", explode(sequence(
        floor(us(s).cast("double") / widthUs).cast("long"),
        floor(us(e).cast("double") / widthUs).cast("long"))))
    val aB = buckets(a, aStart, aEnd)
    val bB = buckets(b, bStart, bEnd).withColumnRenamed("__bk", "__bk_b")
    aB.join(bB, col("__bk") === col("__bk_b")
        // true overlap of the closed intervals…
        && us(aStart) <= us(bEnd) && us(bStart) <= us(aEnd)
        // …counted only in the bucket where the overlap begins
        && col("__bk") === floor(greatest(us(aStart), us(bStart))
                                   .cast("double") / widthUs).cast("long"))
      .drop("__bk", "__bk_b")
  }

  /** q_join_interval: [[intervalJoin]] on real interval × interval
    * sides — user activity sessions (the gaps-and-islands intervals
    * of [[Events.qStreamSession]]) against the TOP-5 error hours
    * (deterministic (n_err DESC, hour ASC) order — corpus-derived, so
    * the incident set is non-empty at every scale; the previous
    * 2×-average spike gate went empty from sf0.1 up once volume
    * smoothed the hourly distribution, leaving the operator untested
    * at 10×), reporting how many sessions and distinct users were
    * live during each incident. The spike hour is the closed
    * interval [h, h + 1 hour − 1 µs] — integer-micros exact on both
    * engines, and a session STARTING exactly at h + 1 hour does not
    * overlap. */
  def qJoinInterval(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Events.qStreamSession(spark, dir)
      .select(col("user_id"), col("session_start"), col("session_end"))
    val hourly = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      // date_trunc always returns LTZ TimestampType; cast back to NTZ
      // for DuckDB naive-TIMESTAMP parity (session tz is UTC, so the
      // cast is wall-clock identity)
      .groupBy(date_trunc("hour", col("ts"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("inc_h"))
      .agg(count(lit(1)).as("n_err"))
    // top-5 by (count, hour): TakeOrderedAndProject — per-partition
    // heaps + a 5-row driver merge, never a global sort
    val incidents = hourly
      .orderBy(col("n_err").desc, col("inc_h").asc).limit(5)
      .select(col("inc_h"), col("n_err"),
              (col("inc_h") + expr("INTERVAL 1 HOUR") - expr("INTERVAL 1 MICROSECOND"))
                .as("inc_end"))
    intervalJoin(sessions, incidents,
                 "session_start", "session_end", "inc_h", "inc_end")
      .groupBy("inc_h", "n_err")
      .agg(count(lit(1)).as("n_sessions"),
           count_distinct(col("user_id")).as("n_users"))
      .orderBy("inc_h")
  }

  /** 2-D skyline (pareto frontier): rows not dominated on
    * (minimize `priceCol`, maximize `dateCol`). A dominates B iff
    * price_A ≤ price_B ∧ date_A ≥ date_B, strict in at least one —
    * equal (price, date) pairs don't dominate each other and are all
    * kept.
    *
    * Scale: the naive formulation is an O(n²) NOT-EXISTS self-join.
    * This is the sweep-line reduction instead: per-date minimum price
    * m(d) (one map-side-combined groupBy over the fact table), a
    * strictly-later running minimum cm(d) over the DISTINCT-DATE table
    * (bounded — dates grow like the calendar, not like the data; the
    * single-partition window is over ~10³ rows at any corpus size),
    * and one broadcast join back. A row survives iff
    * `price == m(date)` (not dominated at its own date) and
    * `price < cm(date)` (not dominated by any strictly-later date).
    * Two scans of the fact table, one tiny broadcast, no pair join.
    */
  def skyline(rows: DataFrame, priceCol: String, dateCol: String): DataFrame = {
    val perDate = rows.groupBy(col(dateCol))
      .agg(min(col(priceCol)).as("m"))
    val swept = perDate.withColumn("cm",
      min(col("m")).over(
        Window.orderBy(col(dateCol).desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    rows.join(broadcast(swept), dateCol)
      .where(col(priceCol) === col("m") &&
             (col("cm").isNull || col(priceCol) < col("cm")))
      .drop("m", "cm")
  }

  /** q_skyline: pareto frontier of lineitem on (lowest
    * l_extendedprice, most recent l_shipdate) — "no cheaper shipment
    * exists at or after this date". */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    skyline(
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"),
      "l_extendedprice", "l_shipdate")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")

  /** Interval union (coverage) per key — the OTHER gaps-and-islands
    * problem next to sessionization: merge overlapping [start, end]
    * intervals and report, per key, how many merged islands remain
    * and the total covered microseconds. The classic window solution:
    * a running max of interval ends ordered by start detects island
    * breaks (an interval whose start exceeds every previous end
    * opens a new island), a running sum of breaks numbers them, and
    * one aggregate per island measures it — one shuffle on the key,
    * two window passes, integer-µs arithmetic end to end.
    *
    * Input: (key, s, e) timestamps with s ≤ e. */
  def intervalUnion(iv: DataFrame): DataFrame = {
    val us = (c: org.apache.spark.sql.Column) =>
      unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    val w = Window.partitionBy("key").orderBy(col("su").asc, col("eu").asc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    iv.select(col("key"), us(col("s")).as("su"), us(col("e")).as("eu"))
      .withColumn("prev_max_e", max(col("eu")).over(wPrev))
      .withColumn("brk",
        when(col("prev_max_e").isNull || col("su") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("key", "island")
      .agg(min(col("su")).as("i_start"), max(col("eu")).as("i_end"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_islands"),
           sum(col("i_end") - col("i_start")).as("covered_us"))
      .orderBy("key")
  }

  /** q_interval_union: per user, total engaged time when every event
    * opens a 5-minute activity window — overlapping windows merge. */
  def qIntervalUnion(spark: SparkSession, dir: String): DataFrame =
    intervalUnion(graft.Tables.events(spark, dir)
      .select(col("user_id").as("key"), col("ts").as("s"),
              (col("ts") + expr("INTERVAL 5 MINUTES")).as("e")))
}
