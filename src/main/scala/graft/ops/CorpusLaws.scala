package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The two classic corpus-statistics LAWS a curation pipeline fits
  * before trusting a source: Zipf's law (token frequency ~ 1/rank^s —
  * a natural-language corpus has s ≈ 1; boilerplate, spam, and
  * machine-generated text bend the line) and Heaps' law (vocabulary
  * grows ~ K·n^β with β ≈ 0.4-0.6 — template farms grow far slower).
  * Both are least-squares fits in log-log space, reported with r² so
  * the READOUT says how law-like the corpus actually is.
  *
  * Determinism discipline (the keySkew/modularity carrier rule): each
  * regression point (ln x, ln y) is snapped to INTEGER MICRO-UNITS
  * (round(ln·10⁶) as DECIMAL(38,0)) before summing, so every
  * regression sum (Σx, Σy, Σxy, Σx², Σy²) is an exact integer —
  * order-independent across partitions and bit-exact against the
  * oracle's identical HUGEINT sums; doubles appear only in the one
  * final closed-form slope/intercept/r² expression, written
  * identically on both engines.
  *
  * Scale: Zipf is one token-count shuffle + a top-K TakeOrdered
  * (K = [[ZipfTopK]], bounded — the single-partition rank window only
  * ever sees K rows) + a 1-row aggregate; Heaps is one per-doc
  * aggregate (map-side combined) + a per-source 1-row-per-source
  * aggregate. Nothing vocabulary- or corpus-sized ever leaves the
  * executors.
  */
object CorpusLaws {

  /** Zipf fits the head of the distribution: top-K ranks by (count
    * desc, token asc). 1000 keeps the single-partition rank window
    * trivially bounded while spanning 3 decades of rank. */
  val ZipfTopK = 1000

  private def dec(c: Column): Column = c.cast("decimal(38,0)")
  /** ln(v) in integer micro-units: the order-independent carrier. */
  private def micro(c: Column): Column =
    dec(round(log(c.cast("double")) * 1e6))

  /** Closed-form least-squares over micro-unit integer sums: appends
    * unrounded slope_raw / intercept_raw / r2_raw columns to a 1-row-
    * per-group frame carrying (n, sx, sy, sxy, sxx, syy). Intercept
    * is in ln units (the 10⁶ carrier scale divides back out of the
    * slope; the intercept rescales by n·10⁶). Degenerate groups
    * (zero x- or y-variance) fit slope 0 / r² 0 — a flat line is
    * reported, not a NaN. */
  private def fit(sums: DataFrame, n: Column): DataFrame = {
    val cov = (dec(n) * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (dec(n) * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (dec(n) * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = when(vx === 0.0, lit(0.0)).otherwise(cov / vx)
    sums
      .withColumn("slope_raw", slope)
      .withColumn("intercept_raw",
        (col("sy").cast("double") - slope * col("sx").cast("double")) /
          (n.cast("double") * lit(1e6)))
      .withColumn("r2_raw",
        when(vx === 0.0 || vy === 0.0, lit(0.0))
          .otherwise(cov * cov / (vx * vy)))
  }

  /** Zipf's-law fit over a (w) token DataFrame: ONE row —
    * (n_types, n_tokens, n_ranks, slope, intercept, r2) — from the
    * log-log regression of frequency on rank over the top
    * [[ZipfTopK]] ranks. A natural corpus has slope ≈ −1. */
  def zipfFit(tokens: DataFrame): DataFrame = {
    // EAGER localCheckpoint (r16 — see Graph.scala header: lazy
    // first-materialization raced concurrent AQE stages into a
    // checkpoint-lock deadlock): the totals and top-K branches BOTH consume
    // the token-count table, and exchange reuse does not collapse the
    // two shuffles (column pruning gives the branches different
    // parents) — without the checkpoint the corpus explode+count runs
    // twice. Materializes once on first action; vocabulary-sized, the
    // same block-level footprint as the graph iteratives' cuts.
    val counts = tokens.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = counts.agg(count(lit(1)).as("n_types"),
                            sum(col("c")).as("n_tokens"))
    // TakeOrdered top-K, then rank INSIDE the bounded K-row set with
    // the same (c desc, w asc) key the limit used — the oracle's
    // row_number() ... QUALIFY rank <= K assigns identically
    val ranked = counts.orderBy(col("c").desc, col("w").asc).limit(ZipfTopK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("w").asc)))
    val x = micro(col("rank"))
    val y = micro(col("c"))
    val sums = ranked.agg(
      count(lit(1)).as("n_ranks"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"))
    fit(sums, col("n_ranks")).crossJoin(totals)
      .select(col("n_types"), col("n_tokens"), col("n_ranks"),
        round(col("slope_raw"), 6).as("slope"),
        round(col("intercept_raw"), 6).as("intercept"),
        round(col("r2_raw"), 6).as("r2"))
  }

  /** q_zipf_fit: [[zipfFit]] over the corpus token stream. */
  def qZipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.docTokens(spark, dir)
              .select(explode(col("toks")).as("w")))

  /** Heaps'-law fit PER SOURCE over (doc_id, source, w) tokens: each
    * document contributes one (ln n_toks, ln n_types) point; the
    * per-source regression of distinct-type growth on document length
    * gives (source, n_docs, beta, k, r2) ordered by source — beta is
    * the Heaps exponent, k = e^intercept the leading coefficient.
    * Template-heavy sources show beta near 0 (every doc reuses the
    * same vocabulary); natural text sits around 0.4-0.6. */
  def heapsFit(tokens: DataFrame): DataFrame = {
    val perDoc = tokens.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_toks"),
           countDistinct(col("w")).as("n_types"))
    val x = micro(col("n_toks"))
    val y = micro(col("n_types"))
    val sums = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"))
    fit(sums, col("n_docs"))
      .select(col("source"), col("n_docs"),
        round(col("slope_raw"), 6).as("beta"),
        round(exp(col("intercept_raw")), 6).as("k"),
        round(col("r2_raw"), 6).as("r2"))
      .orderBy("source")
  }

  /** q_heaps_fit: [[heapsFit]] over the per-document token stream. */
  def qHeapsFit(spark: SparkSession, dir: String): DataFrame =
    heapsFit(Tables.docTokens(spark, dir)
               .select(col("doc_id"), col("source"),
                       explode(col("toks")).as("w")))
}
