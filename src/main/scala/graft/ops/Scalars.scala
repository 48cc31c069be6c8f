package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Scalar-function families (SURVEY.md §2.2): one query per family, each
  * exercising the whole family in a single projection so the oracle
  * covers every function. All `org.apache.spark.sql.functions` built-ins
  * — codegen'd, no UDFs in these paths.
  */
object Scalars {

  /** q_str_funcs: string family over part. */
  def qStrFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        trim(concat(lit("  "), col("p_type"), lit("  "))).as("tr_type"),
        substring(col("p_name"), 1, 8).as("sub_name"),
        concat_ws("-", col("p_brand"), col("p_type")).as("cat_bt"),
        length(col("p_name")).as("len_name"),
        regexp_replace(col("p_type"), " ", "_").as("rep_type"),
        lpad(col("p_brand"), 12, "*").as("pad_brand"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        col("p_type").like("%ECO%").as("is_eco"),
        // split() is the op under test; serialized for the scalar-only
        // driver compare (matching array_to_string on the oracle side)
        array_join(split(col("p_name"), " "), "|").as("name_toks"))
      .orderBy("p_partkey")

  /** q_date_funcs: date/time family over orders. */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate"))
          .cast(org.apache.spark.sql.types.TimestampNTZType).as("mon_start"),
        (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("plus5"),
        datediff(col("o_orderdate"), lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
          .as("days_since"),
        unix_millis(col("o_orderdate").cast(org.apache.spark.sql.types.TimestampType))
          .as("epoch_ms"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy("o_orderkey")

  /** q_math_funcs: math family over lineitem. ceil/floor are cast to
    * BIGINT on the oracle side (DuckDB returns DOUBLE); sign cast to INT
    * on both (return types differ). */
  def qMathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * col("l_discount"), 2).as("rd"),
        round(abs(col("l_extendedprice") - 50000), 2).as("ab"),
        ceil(col("l_discount") * 100).as("ce"),
        floor(col("l_tax") * 100).as("fl"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice") + 1), 6).as("lg"),
        round(exp(col("l_discount")), 6).as("ex"),
        round(pow(col("l_quantity"), 2), 2).as("pw"),
        pmod(col("l_orderkey") - 3, lit(7)).as("pm"),
        signum(col("l_discount") - 0.05).cast(IntegerType).as("sg"),
        greatest(col("l_extendedprice"), col("l_quantity") * 1000).as("gr"),
        least(col("l_extendedprice"), col("l_quantity") * 1000).as("le"))
      // (l_orderkey, l_linenumber) is not unique; rd/ab/fl/pw pin the
      // source columns (discount/extendedprice/tax/quantity), and every
      // other output is derived from those — total order.
      .orderBy("l_orderkey", "l_linenumber", "rd", "ab", "fl", "pw")

  /** q_array_funcs: array family + posexplode (the Generator/UDTF path)
    * over document tokens. Docs have ≥10 tokens (FIXTURES.md) so all
    * slices are full-length. */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.docTokens(spark, dir)
      .select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        // array results are serialized ('|') in this same projection:
        // the driver's compare hashes scalar cells only
        array_join(slice(col("toks"), 2, 3), "|").as("sl"),
        array_contains(col("toks"), "the").as("has_the"),
        array_join(sort_array(slice(col("toks"), 1, 4)), "|").as("srt4"),
        size(array_distinct(col("toks"))).as("n_dist"),
        array_join(
          flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2))),
          "|").as("flat4"),
        array_join(
          zip_with(slice(col("toks"), 1, 3), slice(col("toks"), 2, 3),
                   (a, b) => concat(a, lit("_"), b)), "|").as("zipped"),
        posexplode(slice(col("toks"), 1, 3)))
      .withColumnRenamed("col", "tok")
      .orderBy("doc_id", "pos")

  /** q_map_funcs: map family — constructed in-query (no map column in
    * the test data). Keys/values are serialized in the final projection
    * (the map ops are still exercised upstream), which also makes the
    * query oracle-eligible: DuckDB's MAP family produces the same
    * scalars without a MapType parquet round-trip. */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.docTokens(spark, dir)
      .select(
        col("doc_id"),
        map_from_arrays(
          array(lit("toks"), lit("chars")),
          array(size(col("toks")).cast("long"), col("n_chars"))).as("m"))
      .select(
        col("doc_id"),
        array_join(map_keys(col("m")), "|").as("ks"),
        array_join(transform(map_values(col("m")), _.cast("string")), "|")
          .as("vs"),
        element_at(col("m"), "toks").as("v_toks"),
        element_at(col("m"), "chars").as("v_chars"))
      .orderBy("doc_id")

  /** q_json_funcs: JSON scalar extraction from events.props — both the
    * path-extraction (`get_json_object`) and schema-projection
    * (`from_json`) forms, asserted equal via the oracle. */
  def qJsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", IntegerType))))
          .getField("k").as("kj"))
      .orderBy("event_id")
}
