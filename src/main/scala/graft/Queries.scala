package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Assembles the declared query surface (SURVEY.md §2.2) and the DuckDB
  * oracle SQL for each SQL-expressible query (parity rules §2.3).
  *
  * Every query takes `(spark, sfDir)` and ends in a total order on a
  * unique key tuple; all doubles are rounded in-query; column names are
  * aliased identically on the Spark and oracle sides (the driver's
  * compare sorts columns by name before hashing).
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Shared DuckDB CTE: normalized document tokens (trim-then-split —
    * documents.text has a trailing space, SURVEY.md §7.4.7). */
  private val TOKS =
    "string_split(lower(trim(text)), ' ')"

  val text: Map[String, Q] = Map(
    "q_tokenize"     -> (Text.qTokenize _),
    "q_ngram_bigram" -> (Text.qNgramBigram _),
    "q_ngram_n"      -> (Text.qNgramN _),
    "q_ngram_count"  -> (Text.qNgramCount _),
    "q_text_stats"   -> (Text.qTextStats _),
    "q_tfidf"        -> (Text.qTfidf _),
  )

  val textOracle: Map[String, String] = Map(
    "q_tokenize" ->
      s"""SELECT doc_id, $TOKS AS toks, len($TOKS)::INT AS n_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_ngram_bigram" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents)
         |SELECT doc_id,
         |  list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |                 i -> toks[i] || ' ' || toks[i+1]) AS ngrams
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_ngram_n" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents)
         |SELECT doc_id,
         |  CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
         |       ELSE list_transform(generate_series(1, len(toks)-2),
         |                           i -> array_to_string(toks[i:i+2], ' '))
         |  END AS ngrams
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_ngram_count" ->
      s"""WITH t AS (SELECT $TOKS AS toks FROM documents),
         |g AS (SELECT unnest(list_transform(generate_series(1, greatest(len(toks)-1,0)),
         |                    i -> toks[i] || ' ' || toks[i+1])) AS ngram FROM t)
         |SELECT ngram, count(*) AS cnt FROM g
         |GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 50""".stripMargin,
    "q_text_stats" ->
      s"""WITH t AS (SELECT lang, $TOKS AS toks, length(trim(text)) AS nc FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  round(avg(len(toks)), 2) AS avg_tokens,
         |  round(avg(nc), 2) AS avg_chars,
         |  round(avg(len(list_distinct(toks))::DOUBLE / len(toks)), 6) AS avg_distinct_ratio
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q_tfidf" ->
      s"""WITH t AS (SELECT doc_id, unnest($TOKS) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
         |SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         |  round(tf.tf * ln(n.n_docs / dfq.df), 6) AS tfidf
         |FROM tf, dfq, n WHERE tf.term = dfq.term
         |ORDER BY tf.doc_id, tf.term""".stripMargin,
  )

  /** The full declared registry. */
  val all: Map[String, Q] = text

  /** DuckDB oracle for every SQL-expressible query. */
  val oracle: Map[String, String] = textOracle
}
