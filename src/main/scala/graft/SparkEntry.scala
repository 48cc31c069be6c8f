package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one capability end-to-end: parquet scan → tokenize →
    * bigram (ml.Pipeline Tokenizer→NGram) → ordered output. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q_ngram_bigram")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
  /** sf1-gate oracle overrides (distinct-factored / sliced forms for
    * oracles that are deliberately quadratic at sf0.01) —
    * name -> (duckdbSql, sparkResultWhere). See [[Queries.oracleSf1]]. */
  def oracleSqlSf1: Map[String, (String, String)] = Queries.oracleSf1
}
