package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources/sinks beyond parquet: CSV and JSON (lossless
  * round-trip given an explicit schema — never infer on a 100 TB read;
  * schema inference is a full extra scan), plus hive-style partitioned
  * parquet for partition-pruned scans.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip (native Spark source — same pushdown/pruning
    * machinery as parquet: predicate pushdown into ORC stripe/row-group
    * indexes, column projection into the reader). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet: a filter on the partition column
    * prunes directories at planning time (PartitionFilters in the scan),
    * reading only matching files — the at-rest layout for selective
    * queries at scale. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
