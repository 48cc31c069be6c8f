package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL entry point: the same engine through `spark.sql` over registered
  * temp views — a user of the reference's record-pipeline could instead
  * run ANSI SQL directly. The two TPC-H-shaped queries below run the
  * IDENTICAL SQL text on Spark and on the DuckDB oracle (the rounding
  * call is the only per-engine substitution), demonstrating
  * dialect-level parity, and exercise multi-join planning (Catalyst
  * join ordering + broadcast of the dim chain) that the DSL queries
  * fix by hand.
  */
object Sql {

  /** The most recent dir registered per session: every q_sql_* entry
    * point calls [[registerTables]], and re-registering 9 views per
    * query is measurable overhead inside the bench's timed region
    * (tools/RegProbe) for work a catalog does once. Registration is
    * skipped only when THIS dir is already the session's current
    * registration; alternating dirs re-register correctly. */
  private val lastRegistered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Registers all test tables as temp views (idempotent; no-op when
    * `dir` is already the session's current registration). The dir is
    * recorded AFTER all nine views exist (r17, ADVICE): recording it
    * first meant a mid-loop load failure (missing/corrupt table) left
    * the session claiming registration it never completed — every
    * later q_sql_* would fail on missing views with no retry path. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    if (lastRegistered.get(spark) != dir) {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings")
        .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
      lastRegistered.put(spark, dir)
    }

  /** TPC-H Q3 shape; `rnd` renders the engine's round-to-2 call. */
  def q3Template(rnd: String => String): String =
    s"""SELECT l_orderkey, ${rnd("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
       |       o_orderdate, o_orderpriority
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 20""".stripMargin

  /** TPC-H Q5 shape: 6-table join through the dim chain. */
  def q5Template(rnd: String => String): String =
    s"""SELECT n_name, ${rnd("sum(l_extendedprice * (1 - l_discount))")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q1 shape: the pricing-summary scan-heavy aggregate (the
    * canonical "is your scan+agg path fast" query). */
  def q1Template(rnd: String => String): String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${rnd("sum(l_quantity)")} AS sum_qty,
       |  ${rnd("sum(l_extendedprice)")} AS sum_base_price,
       |  ${rnd("sum(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
       |  ${rnd("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS sum_charge,
       |  ${rnd("avg(l_quantity)")} AS avg_qty,
       |  ${rnd("avg(l_extendedprice)")} AS avg_price,
       |  ${rnd("avg(l_discount)")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q10 shape: returned-item revenue report — 4-table join,
    * wide group-by, top 20 by revenue. */
  def q10Template(rnd: String => String): String =
    s"""SELECT c_custkey, c_name,
       |  ${rnd("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
       |  ${rnd("c_acctbal")} AS c_acctbal, n_name
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1995-01-01'
       |  AND o_orderdate < TIMESTAMP '1995-07-01'
       |  AND l_returnflag = 'R'
       |  AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q18 shape: large-volume-customer report — the IN-subquery
    * with HAVING over an aggregate (decorrelated by Catalyst into a
    * semi-join against the grouped lineitem), then a 3-table join and
    * top-100. Exercises the subquery-rewrite path none of the other
    * SQL queries touch. */
  def q18Template(rnd: String => String): String =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       |  ${rnd("o_totalprice")} AS o_totalprice,
       |  ${rnd("sum(l_quantity)")} AS sum_qty
       |FROM customer, orders, lineitem
       |WHERE o_orderkey IN (
       |    SELECT l_orderkey FROM lineitem
       |    GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
       |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q6 shape: the forecasting-revenue-change query — a single
    * selective scan+agg whose predicates must ALL reach the parquet
    * reader (the canonical data-skipping benchmark). */
  def q6Template(rnd: String => String): String =
    s"""SELECT ${rnd("sum(l_extendedprice * l_discount)")} AS revenue,
       |       count(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.03 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  /** Scalar-subquery shape: orders above the global average price —
    * exercises Catalyst's ScalarSubquery planning (one-row subquery
    * broadcast into the filter), the remaining subquery form after
    * Q18's IN. */
  def qScalarTemplate(rnd: String => String): String =
    s"""SELECT o_orderkey, o_custkey, ${rnd("o_totalprice")} AS o_totalprice
       |FROM orders
       |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 200""".stripMargin

  /** TPC-H Q4 shape (adapted: no commit/receipt dates in the test
    * schema, so "late" = shipped >30 days after order date): the
    * correlated EXISTS that Catalyst decorrelates into a left
    * semi-join before the priority rollup. */
  def q4Template(rnd: String => String): String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |              WHERE l_orderkey = o_orderkey
       |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 shape: volume shipping between a nation pair — the
    * self-joined dimension (nation n1 × nation n2) with a symmetric
    * OR pair predicate, a 6-relation join Catalyst must order, and a
    * derived-table group-by. */
  def q7Template(rnd: String => String): String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |       ${rnd("sum(volume)")} AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         CAST(year(l_shipdate) AS INT) AS l_year,
       |         l_extendedprice * (1 - l_discount) AS volume
       |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
       |      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q12 shape (adapted: priority classes instead of the absent
    * ship-mode column): join + CASE-bucketed conditional counts.
    * The sums are CAST for parity — DuckDB widens sum(int) to
    * HUGEINT, Spark to BIGINT. */
  def q12Template(rnd: String => String): String =
    s"""SELECT l_linestatus,
       |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
       |                  OR o_orderpriority = '2-HIGH'
       |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
       |                 AND o_orderpriority <> '2-HIGH'
       |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM orders, lineitem
       |WHERE o_orderkey = l_orderkey
       |  AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q13 shape: customer order-count distribution — the LEFT
    * OUTER join with an extra predicate that must stay in the join
    * condition (in WHERE it would turn the join inner), then a
    * double aggregation (per-customer count → histogram of counts). */
  def q13Template(rnd: String => String): String =
    s"""SELECT c_count, count(*) AS custdist
       |FROM (
       |  SELECT c_custkey, count(o_orderkey) AS c_count
       |  FROM customer LEFT OUTER JOIN orders
       |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
       |  GROUP BY c_custkey
       |) c_orders
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14 shape: promo revenue share — conditional aggregate
    * ratio in one pass over a month of lineitem joined to part. */
  def q14Template(rnd: String => String): String =
    s"""SELECT ${rnd("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) / sum(l_extendedprice * (1 - l_discount))")} AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= TIMESTAMP '1996-09-01'
       |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** TPC-H Q17 shape: small-quantity-order revenue — the correlated
    * scalar subquery (per-part average) Catalyst decorrelates into an
    * aggregate-then-join; the canonical test that correlated scalars
    * don't re-scan per outer row. */
  def q17Template(rnd: String => String): String =
    s"""SELECT ${rnd("sum(l_extendedprice) / 7.0")} AS avg_yearly
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
       |  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
       |                    FROM lineitem l2
       |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    * predicate spanning both join sides — exercises disjunctive
    * predicate handling (the common-conjunct extraction that keeps
    * the join from degenerating to a filterless cross product). */
  def q19Template(rnd: String => String): String =
    s"""SELECT ${rnd("sum(l_extendedprice * (1 - l_discount))")} AS revenue,
       |       count(*) AS n_rows
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey
       |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |        AND l_quantity BETWEEN 1 AND 21)
       |    OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
       |        AND l_quantity BETWEEN 10 AND 40)
       |    OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50
       |        AND l_quantity BETWEEN 20 AND 50))""".stripMargin

  /** TPC-H Q21 shape (adapted: "late" = shipped >60 days after order
    * date): suppliers who were the SOLE late shipper on a
    * multi-supplier finished order — EXISTS and NOT EXISTS against
    * the same fact table with different correlated predicates, the
    * heaviest subquery-planning shape in the suite. */
  def q21Template(rnd: String => String): String =
    s"""SELECT s_name, count(*) AS numwait
       |FROM supplier, lineitem l1, orders, nation
       |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
       |  AND o_orderstatus = 'F'
       |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
       |  AND s_nationkey = n_nationkey AND n_name = 'NATION_19'
       |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q22 shape (adapted: nation-key segment in place of the
    * absent phone prefix, and "no orders since 2000" instead of "no
    * orders ever" — the synthetic order stream covers nearly every
    * customer): above-average-balance lapsed customers — NOT EXISTS
    * anti-join gated by an uncorrelated scalar-average subquery. */
  def q22Template(rnd: String => String): String =
    s"""SELECT cntrycode, count(*) AS numcust,
       |       ${rnd("sum(c_acctbal)")} AS totacctbal
       |FROM (
       |  SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal
       |  FROM customer
       |  WHERE c_nationkey % 5 IN (0, 1, 2)
       |    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
       |                     WHERE c_acctbal > 0.0)
       |    AND NOT EXISTS (SELECT 1 FROM orders
       |                    WHERE o_custkey = c_custkey
       |                      AND o_orderdate >= TIMESTAMP '2000-01-01')
       |) custsale
       |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  /** TPC-H Q8 shape: national market share — the widest join in the
    * suite (8 relations, nation joined TWICE for supplier vs customer
    * geography) with a CASE-conditional share ratio per year. */
  def q8Template(rnd: String => String): String =
    s"""SELECT o_year,
       |  ${rnd("sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END) / sum(volume)")} AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |         l_extendedprice * (1 - l_discount) AS volume,
       |         n2.n_name AS nation
       |  FROM part, supplier, lineitem, orders, customer, nation n1,
       |       nation n2, region
       |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'
       |    AND p_type = 'PROMO'
       |) all_nations
       |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q15 shape: top supplier — an aggregate revenue view whose
    * MAX gates the outer query through an uncorrelated scalar
    * subquery over the SAME view (evaluated once, not per row). */
  def q15Template(rnd: String => String): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, ${rnd("total_revenue")} AS total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  /** Recursive CTE shape (Spark 4's `WITH RECURSIVE` → UnionLoop
    * plan): a doubling chain seeded from the part table with a JOIN in
    * the recursive step — the iterative-closure form (BOM explosion,
    * org charts, graph reachability) that previously forced a
    * driver-side loop; depth-bounded, deterministic, identical text on
    * DuckDB. */
  def qRecursiveTemplate(rnd: String => String): String =
    s"""WITH RECURSIVE chain(k, depth) AS (
       |  SELECT p_partkey, 0 AS depth FROM part WHERE p_partkey <= 3
       |  UNION ALL
       |  SELECT p.p_partkey, c.depth + 1 FROM chain c
       |  JOIN part p ON p.p_partkey = c.k * 2
       |  WHERE c.depth < 10)
       |SELECT k, min(depth) AS depth, count(*) AS n_paths
       |FROM chain GROUP BY k ORDER BY k""".stripMargin

  /** The fixture has no `partsupp` table (TESTDATA.md), which TPC-H
    * Q2/Q9/Q11/Q16/Q20 all require. Derive one deterministically from
    * lineitem — every (partkey, suppkey) pair that ever shipped, with
    * availqty = 10× the line count and supplycost = the minimum unit
    * price observed. The IDENTICAL CTE text runs on Spark and on the
    * DuckDB oracle, so the derivation itself is oracle-checked (the
    * constructed-input pattern: q_upsert / q_source_overlap
    * precedents). `min` over doubles is order-independent and the
    * division is bit-exact, so the derived table is bit-identical in
    * both engines. */
  private val psCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         count(*) * 10 AS ps_availqty,
      |         min(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  /** TPC-H Q2 shape (adapted: derived partsupp, fixture columns only —
    * no s_address/s_phone/p_mfgr): minimum-cost supplier per
    * European large part — the correlated scalar-min subquery that
    * re-joins the SAME dim chain as the outer query. Tests that the
    * correlated min is planned as one aggregate-then-join, not a
    * per-row rescan of the 4-table chain. */
  def q2Template(rnd: String => String): String =
    s"""WITH $psCte
       |SELECT ${rnd("s_acctbal")} AS s_acctbal, s_name, n_name,
       |       p_partkey, p_type, ${rnd("ps_supplycost")} AS ps_supplycost
       |FROM part, supplier, partsupp, nation, region
       |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT min(ps2.ps_supplycost)
       |    FROM partsupp ps2, supplier s2, nation n2, region r2
       |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
       |      AND s2.s_nationkey = n2.n_nationkey
       |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** TPC-H Q9 shape (adapted: derived partsupp; '%bolt%' for the
    * absent '%green%' name vocabulary): product-type profit by nation
    * and year — the 6-relation join where lineitem joins partsupp on
    * the COMPOSITE (partkey, suppkey) key, the only two-column join
    * key in the suite. */
  /** Profit is summed in INTEGER CENTS (the q11 discipline): each
    * per-row amount rounds to 2 dp on identical doubles, scales ×100
    * into DECIMAL(38,0), and the sum is order-independent. The raw
    * `round(sum(amount), 2)` form flipped a half-cent at sf1
    * (−4695860.18 vs .19 — the 9-digit sum's last ulps straddle the
    * boundary), the exact failure q_sql_q11 had at sf0.01.
    *
    * DECLARED DEVIATION from upstream TPC-H (ADVICE r8): TPC-H
    * defines `sum_profit` as round-of-sum over unrounded per-row
    * amounts; this suite's sum-of-per-row-cent-rounded form can
    * accumulate per-row half-ulp rounding and differ from the TPC-H
    * answer set by more than the last cent. Both engines here apply
    * the SAME definition (the gate's bit-exactness is about
    * engine-vs-oracle agreement, not the published answer set —
    * BASELINE.md carries no TPC-H answers), and the cent carrier is
    * what makes that agreement deterministic under Spark's
    * partial-agg fold-order variance. A consumer needing the
    * upstream number should use round-of-sum and compare with a
    * float tolerance, as the sf1 gate does. */
  def q9Template(rnd: String => String): String =
    s"""WITH $psCte
       |SELECT nation, o_year,
       |       CAST(sum(amount_cents) AS DOUBLE) / 100 AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |         CAST(round(${rnd("l_extendedprice * (1 - l_discount)" +
                                  " - ps_supplycost * l_quantity")} * 100)
       |              AS DECIMAL(38,0)) AS amount_cents
       |  FROM part, supplier, lineitem, partsupp, orders, nation
       |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
       |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |    AND p_name LIKE '%bolt%'
       |) profit
       |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 shape (adapted: derived partsupp; the gate is "above
    * 2× the average per-part value" instead of the SF-scaled fixed
    * fraction — a FIXED fraction of the nation total empties the
    * result as the part count grows, which is exactly why the
    * official query scales its constant by 1/SF; the average-relative
    * form selects ~the same quantile at every scale; NATION_19
    * because it has suppliers even in the 10-supplier sf0.001
    * fixture — same reason Q21 uses it): important-stock parts in one
    * nation — the HAVING gated by an uncorrelated scalar subquery
    * that re-runs the SAME aggregate over the SAME join (evaluated
    * once and broadcast, not per group).
    *
    * Money is summed in INTEGER CENTS: each per-row stock value is
    * rounded to 2 dp (engine-matched `rnd`), scaled ×100 and cast to
    * BIGINT before the sum. A raw `round(sum(double), 2)` here is a
    * run-to-run coin flip — ps_supplycost is a full-precision
    * division, and a group whose true total sits within an ulp of a
    * half-cent boundary (sf0.01 has one: partkey 1223 at ≈943577.515)
    * flips its last cent with Spark's partial-agg addition order.
    * Integer sums are order-independent, and the HAVING threshold
    * (2× mean part value) is derived from the same exact cents. The
    * carrier is DECIMAL(38,0): BIGINT cent sums cross 2⁶³ at large
    * scale factors, where Spark wraps/throws but DuckDB silently
    * promotes to HUGEINT — the comparisons go through DOUBLE casts so
    * both engines run identical IEEE arithmetic. */
  def q11Template(rnd: String => String): String =
    s"""WITH $psCte,
       |pv AS (
       |  SELECT ps_partkey,
       |         CAST(round(${rnd("ps_supplycost * ps_availqty")} * 100)
       |              AS DECIMAL(38,0)) AS v_cents
       |  FROM partsupp, supplier, nation
       |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_name = 'NATION_19')
       |SELECT ps_partkey,
       |       CAST(sum(v_cents) AS DOUBLE) / 100 AS total_value
       |FROM pv
       |GROUP BY ps_partkey
       |HAVING CAST(sum(v_cents) AS DOUBLE) > (
       |  SELECT CAST(sum(v_cents) AS DOUBLE) * 2
       |           / count(DISTINCT ps_partkey) FROM pv)
       |ORDER BY total_value DESC, ps_partkey""".stripMargin

  /** TPC-H Q16 shape (adapted: derived partsupp; the
    * customer-complaints supplier exclusion is dropped — the fixture
    * has no s_comment column): supplier count per (brand, type, size)
    * bucket — count(DISTINCT) under a multi-column group-by with
    * NOT-IN value-list predicates. Integer/string only: no float
    * parity surface at all. */
  def q16Template(rnd: String => String): String =
    s"""WITH $psCte
       |SELECT p_brand, p_type, p_size,
       |       count(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp, part
       |WHERE p_partkey = ps_partkey
       |  AND p_brand <> 'Brand#1'
       |  AND p_type NOT IN ('PROMO', 'ECONOMY')
       |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape (adapted: derived partsupp; 'small%' parts,
    * fixture nation): suppliers holding excess stock of a part family
    * — a three-deep nesting where the innermost scalar subquery
    * correlates on BOTH columns of the composite key from the middle
    * IN-subquery. The deepest correlation shape in the suite. */
  def q20Template(rnd: String => String): String =
    s"""WITH $psCte
       |SELECT s_name, s_suppkey
       |FROM supplier, nation
       |WHERE s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (SELECT p_partkey FROM part
       |                         WHERE p_name LIKE 'small%')
       |      AND ps_availqty > (
       |        SELECT 0.5 * sum(l_quantity) FROM lineitem
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= TIMESTAMP '1996-01-01'
       |          AND l_shipdate < TIMESTAMP '1997-01-01'))
       |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
       |ORDER BY s_name, s_suppkey""".stripMargin

  private val sparkRound: String => String = e => s"round($e, 2)"

  /** q_sql_q1: TPC-H Q1 via spark.sql. */
  def qSqlQ1(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q1Template(sparkRound))
  }

  /** q_sql_q3: TPC-H Q3 via spark.sql. */
  def qSqlQ3(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q3Template(sparkRound))
  }

  /** q_sql_q5: TPC-H Q5 via spark.sql. */
  def qSqlQ5(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q5Template(sparkRound))
  }

  /** q_sql_q10: TPC-H Q10 via spark.sql. */
  def qSqlQ10(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q10Template(sparkRound))
  }

  /** q_sql_q18: TPC-H Q18 via spark.sql. */
  def qSqlQ18(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q18Template(sparkRound))
  }

  /** q_sql_scalar: scalar-subquery filter via spark.sql. */
  def qSqlScalar(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(qScalarTemplate(sparkRound))
  }

  /** q_sql_q6: TPC-H Q6 via spark.sql. */
  def qSqlQ6(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q6Template(sparkRound))
  }

  /** q_sql_q4: TPC-H Q4 shape via spark.sql. */
  def qSqlQ4(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q4Template(sparkRound))
  }

  /** q_sql_q7: TPC-H Q7 shape via spark.sql. */
  def qSqlQ7(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q7Template(sparkRound))
  }

  /** q_sql_q12: TPC-H Q12 shape via spark.sql. */
  def qSqlQ12(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q12Template(sparkRound))
  }

  /** q_sql_q13: TPC-H Q13 shape via spark.sql. */
  def qSqlQ13(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q13Template(sparkRound))
  }

  /** q_sql_q14: TPC-H Q14 shape via spark.sql. */
  def qSqlQ14(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q14Template(sparkRound))
  }

  /** q_sql_q17: TPC-H Q17 shape via spark.sql. */
  def qSqlQ17(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q17Template(sparkRound))
  }

  /** q_sql_q19: TPC-H Q19 shape via spark.sql. */
  def qSqlQ19(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q19Template(sparkRound))
  }

  /** q_sql_q21: TPC-H Q21 shape via spark.sql. */
  def qSqlQ21(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q21Template(sparkRound))
  }

  /** q_sql_q22: TPC-H Q22 shape via spark.sql. */
  def qSqlQ22(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q22Template(sparkRound))
  }

  /** q_sql_recursive: recursive-CTE chain via spark.sql. */
  def qSqlRecursive(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(qRecursiveTemplate(sparkRound))
  }

  /** q_sql_q8: TPC-H Q8 shape via spark.sql. */
  def qSqlQ8(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q8Template(sparkRound))
  }

  /** q_sql_q15: TPC-H Q15 shape via spark.sql. */
  def qSqlQ15(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q15Template(sparkRound))
  }

  /** q_sql_q2: TPC-H Q2 shape via spark.sql. */
  def qSqlQ2(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q2Template(sparkRound))
  }

  /** q_sql_q9: TPC-H Q9 shape via spark.sql. */
  def qSqlQ9(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q9Template(sparkRound))
  }

  /** q_sql_q11: TPC-H Q11 shape via spark.sql. */
  def qSqlQ11(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q11Template(sparkRound))
  }

  /** q_sql_q16: TPC-H Q16 shape via spark.sql. */
  def qSqlQ16(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q16Template(sparkRound))
  }

  /** q_sql_q20: TPC-H Q20 shape via spark.sql. */
  def qSqlQ20(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(q20Template(sparkRound))
  }
}
