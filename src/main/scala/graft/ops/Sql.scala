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

  private val sparkRound: String => String = e => s"round($e, 2)"

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
}
