package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedInnerJoin == plain inner join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .collect().head.toSeq
    val salted = Skew.saltedInnerJoin(li, o, "l_orderkey", buckets = 8)
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .collect().head.toSeq
    assert(salted == plain)
  }
}
