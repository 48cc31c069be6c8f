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

  /** Registers all test tables as temp views (idempotent). */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))

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
}
