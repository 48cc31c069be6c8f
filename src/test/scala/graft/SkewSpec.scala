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

  test("sharedSpans df-bound kills the boilerplate-span m² blowup, keeps real dups") {
    import spark.implicits._
    import graft.ops.Dedup
    // 1000 docs all carrying the same 20-token boilerplate run (a nav/
    // legal footer), plus two docs sharing a RARE 20-token span
    val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")
    val rare = (1 to 20).map(i => s"rare$i").mkString(" ")
    val docs = (1L to 1000L).map(i => (i, s"$boiler unique${i}a unique${i}b")) ++
      Seq((2001L, s"$rare tail1"), (2002L, s"$rare tail2"))
    val toks = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val pairs = Dedup.sharedSpans(toks, w = 20, maxDf = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // unbounded, the boilerplate span alone would emit 1000·999/2 =
    // 499 500 pairs on ONE shuffle key; the df-bound drops it entirely
    assert(pairs.toSeq == Seq((2001L, 2002L)))
  }
}
