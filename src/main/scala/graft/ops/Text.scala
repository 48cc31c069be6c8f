package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{NGram, Tokenizer}

import graft.Tables

/** Text / n-gram operators — the reference's flagship capability
  * (NGramTransform.java:96-134) re-expressed Spark-first, plus the
  * north-star text-analysis surface (SURVEY.md §2.2 "Text analysis").
  *
  * Two equivalent n-gram implementations are provided and cross-tested:
  *  - [[ngramMl]]: the `ml.Pipeline(Tokenizer → NGram)` path — the same
  *    MLlib transformer the reference wraps (NGramTransform.java:116-118);
  *  - [[ngramCol]]: a pure Catalyst higher-order expression (codegen-able
  *    plan, no ML uid bookkeeping) used by the registered queries so the
  *    whole plan stays in whole-stage codegen.
  *
  * Semantics (both, == Spark ML NGram, == reference docs example
  * docs/NGramTransform-sparkcompute.md:35-53): slide a width-n window over
  * the token array; each window joins its n tokens with one space; partial
  * windows are dropped, so < n tokens ⇒ empty array; 1:1 row mapping.
  */
object Text {

  /** N-grams as a Catalyst expression over an array<string> column.
    * Guard: Spark's `sequence(1, x)` DESCENDS when x < 1, so short rows
    * must short-circuit to an empty array (reference behavior R9 default
    * mode, SURVEY.md §7.4.2).
    */
  def ngramCol(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Strict mode mirroring the reference's fail-fast: the CDAP plugin's
    * non-nullable output schema makes the whole run FAIL when any row has
    * fewer than n tokens (NGramTransform.java:101-102, :122-133;
    * NGramTransformTest.java:201-219). Here: raise on the offending row.
    */
  def ngramColStrict(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(toks) < n,
      raise_error(concat(lit(s"ngram(strict): row has fewer than $n tokens: "),
        array_join(toks, " "))).cast(ArrayType(StringType)))
      .otherwise(ngramCol(toks, n))
  }

  /** The reference pipeline: Tokenizer → NGram(n), applied to a string
    * column; returns input df + `outputCol` (array<string> of n-grams).
    * Validates the input column exists and is a string, mirroring the
    * reference's deploy-time gate (NGramTransform.java:83-93).
    */
  def ngramMl(df: DataFrame, textCol: String, n: Int, outputCol: String): DataFrame = {
    val field = df.schema.fields.find(_.name == textCol).getOrElse(
      throw new IllegalArgumentException(s"input field $textCol not in schema"))
    require(field.dataType == StringType, s"$textCol must be string, got ${field.dataType}")
    val tok = new Tokenizer().setInputCol(textCol).setOutputCol(s"__${outputCol}_toks")
    val ng = new NGram().setN(n).setInputCol(tok.getOutputCol).setOutputCol(outputCol)
    new Pipeline().setStages(Array(tok, ng)).fit(df)
      .transform(df).drop(tok.getOutputCol)
  }

  /** Tokenize applied to an array-typed column like the reference's
    * transform stage: validates array type at "analysis time"
    * (NGramTransform.java:85-92 analog) then maps tokens→ngrams 1:1.
    */
  def ngramOverTokens(df: DataFrame, tokensCol: String, n: Int, outputCol: String,
                      strict: Boolean = false): DataFrame = {
    val field = df.schema.fields.find(_.name == tokensCol).getOrElse(
      throw new IllegalArgumentException(s"input field $tokensCol not in schema"))
    require(field.dataType.isInstanceOf[ArrayType],
      s"$tokensCol must be array<string>, got ${field.dataType}")
    val f = if (strict) ngramColStrict(col(tokensCol), n) else ngramCol(col(tokensCol), n)
    // R3/R7 projection semantics: output is exactly the n-gram column.
    df.select(f.as(outputCol))
  }

  /** Plain-Scala n-gram (the semantics in one line) — basis for the UDF
    * variant and the ScalaCheck properties. */
  def ngramsScala(toks: Seq[String], n: Int): Seq[String] = {
    require(n >= 1, s"n must be >= 1, got $n")
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq
  }

  /** Scalar-UDF variant of the n-gram transform (extension-point demo;
    * cross-checked against [[ngramCol]] in tests). Prefer [[ngramCol]]
    * in real plans — the expression form stays inside codegen, the UDF
    * pays serialization per row. */
  val ngramUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((toks: Seq[String], n: Int) => ngramsScala(toks, n))

  // ---- registered queries (SURVEY.md §2.2 Text family) ----

  /** q_tokenize: lowercase + whitespace tokenization of documents.text.
    * The token ARRAY is the computation under test; the final projection
    * serializes it ('|' join) because the driver's compare layer hashes
    * scalar cells only — the oracle SQL serializes identically. */
  def qTokenize(spark: SparkSession, dir: String): DataFrame =
    Tables.docTokens(spark, dir)
      .select(col("doc_id"), array_join(col("toks"), "|").as("toks"),
              size(col("toks")).as("n_tokens"))
      .orderBy("doc_id")

  // ------------------------------------------------------------------
  // Script-aware tokenization (r15): CJK text does not whitespace-
  // delimit words, so whitespace tokenization collapses a CJK sentence
  // into ONE giant token — token counts, dedup shingles, BM25 and the
  // quality gates all silently degrade on the CJK slice of any real
  // web corpus. The standard no-segmenter fallback is CHARACTER
  // BIGRAMS over CJK runs (what CJK analyzers in Lucene/Elastic do by
  // default); Latin/other segments keep the whitespace tokenizer.
  // ------------------------------------------------------------------

  /** CJK codepoint class, Java regex syntax: Han (URO + Extension A),
    * Hiragana, Katakana, Hangul syllables. */
  private[graft] val CjkClassJava =
    "[\\u4E00-\\u9FFF\\u3400-\\u4DBF\\u3040-\\u30FF\\uAC00-\\uD7AF]"

  /** The same class in RE2 syntax — the DuckDB oracle mirror. */
  private[graft] val CjkClassRe2 =
    "[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]"

  /** Deterministic CJK chars for constructed-input fixtures (Han,
    * Hiragana, Katakana, Hangul — the q_tokenize_cjk oracle carries
    * the same literals). */
  private[graft] val CjkFixtureChars: Seq[String] =
    Seq("中", "文", "分", "词", "数", "据", "あ", "い", "カ", "한", "국")

  /** Character bigrams of every CJK run in `text` (a 1-char run
    * yields the char itself — substr(1,2) of a 1-char string). Pure
    * column arithmetic: regexp_extract_all + nested transform, stays
    * in whole-stage codegen, no UDF. */
  def cjkBigrams(text: Column): Column = {
    val runs = regexp_extract_all(text, lit(CjkClassJava + "+"), lit(0))
    flatten(transform(runs, r =>
      transform(sequence(lit(1), greatest(length(r) - 1, lit(1))),
                i => r.substr(i, lit(2)))))
  }

  /** Script-aware tokenization: CJK runs become character bigrams
    * (appended after the whitespace tokens — deterministic order both
    * engines can mirror), everything else is the standard lowercase
    * whitespace tokenizer with CJK runs blanked first. Drop-in
    * `array<string>` shape — composes with the shingle/dedup/BM25
    * stack unchanged (TextOpsPropertiesSpec pins a MinHash-shingle
    * composition over CJK tokens). */
  def tokenizeScriptAware(text: Column): Column = {
    val latin = split(lower(trim(regexp_replace(text, CjkClassJava + "+", " "))),
                      "\\s+")
    concat(filter(latin, t => length(t) > 0), cjkBigrams(text))
  }

  /** q_tokenize_cjk: [[tokenizeScriptAware]] over a CONSTRUCTED
    * mixed-script corpus (the q_upsert constructed-input pattern —
    * the fixture documents are ASCII, so the CJK branches must be
    * driven by planted runs): per doc a deterministic 3-char CJK
    * snippet lands as a suffix, a prefix, or the whole text by
    * doc_id mod 3. Oracle-checked — the DuckDB mirror runs the same
    * regex class, run extraction, and bigram slide. */
  def qTokenizeCjk(spark: SparkSession, dir: String): DataFrame = {
    val cs = typedlit(CjkFixtureChars)
    def pick(e: Column) = element_at(cs, (pmod(e, lit(11)) + 1).cast("int"))
    val snip = concat(pick(col("doc_id")), pick(col("doc_id") + 3),
                      pick(col("doc_id") * 7 + 1))
    val mixed = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"),
              when(col("doc_id") % 3 === 0, concat(col("text"), lit(" "), snip))
                .when(col("doc_id") % 3 === 1, concat(snip, lit(" "), col("text")))
                .otherwise(snip).as("text"))
    mixed
      .withColumn("toks", tokenizeScriptAware(col("text")))
      .select(col("doc_id"), array_join(col("toks"), "|").as("toks"),
              size(col("toks")).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** q_ngram_bigram: the reference operator (R6) — per-doc bigram array,
    * 1:1, empty array when < 2 tokens. Uses the MLlib path (flagship,
    * SURVEY.md §7.3); goldens assert ml ≡ expression form.
    */
  def qNgramBigram(spark: SparkSession, dir: String): DataFrame =
    ngramMl(
      Tables.documents(spark, dir).withColumn("text", trim(col("text"))),
      "text", 2, "ngrams")
      // serialize the n-gram array for the scalar-only compare layer
      // (empty array -> '' on both engines)
      .select(col("doc_id"), array_join(col("ngrams"), "|").as("ngrams"))
      .orderBy("doc_id")

  /** q_ngram_n: general n (n=3) via the pure-expression form. */
  def qNgramN(spark: SparkSession, dir: String): DataFrame =
    Tables.docTokens(spark, dir)
      .select(col("doc_id"),
              array_join(ngramCol(col("toks"), 3), "|").as("ngrams"))
      .orderBy("doc_id")

  /** q_ngram_count: corpus bigram frequency — explode → count → top-50
    * (count desc, ngram asc for a total order). Map-side partial agg is
    * automatic; at scale this is the classic skew-tolerant word-count.
    */
  def qNgramCount(spark: SparkSession, dir: String): DataFrame =
    Tables.docTokens(spark, dir)
      .select(explode(ngramCol(col("toks"), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(50)

  /** Per-document n-gram NOVELTY — the memorization/redundancy
    * curation readout: of each document's distinct bigrams, what
    * fraction is INTRODUCED by this document (no document with a
    * smaller doc_id contains it)? A crawl segment full of boilerplate
    * scores near 0; fresh prose scores near 1. Corpus-order here is
    * doc_id (ingestion order); any total order works the same way.
    *
    * Scale: one (doc_id, bigram)-distinct explode (the n-gram table a
    * dedup pass builds anyway), one map-side-combined min(doc_id)
    * reduce per bigram, one equi-join back on the bigram, one per-doc
    * count — all linear in total bigram volume, nothing collected.
    * Docs with < 2 tokens report 0 bigrams / ratio 0 (not NaN). */
  def ngramNovelty(docToks: DataFrame, n: Int = 2): DataFrame = {
    val grams = docToks
      .select(col("doc_id"),
              explode(array_distinct(ngramCol(col("toks"), n))).as("g"))
    val firstSeen = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    val perDoc = grams.join(firstSeen, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
             .as("n_novel"))
    // left join back to ALL docs so <n-token docs still report a row
    docToks.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("n_grams"), lit(0L)).as("n_grams"),
              coalesce(col("n_novel"), lit(0L)).as("n_novel"),
              when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
                .otherwise(round(col("n_novel").cast("double") /
                                   col("n_grams"), 6)).as("novelty"))
      .orderBy("doc_id")
  }

  /** q_ngram_novelty: [[ngramNovelty]] (bigrams) over the corpus. */
  def qNgramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNovelty(Tables.docTokens(spark, dir))

  /** q_text_stats: per-lang doc count, avg token count, avg chars,
    * avg distinct-token ratio.
    */
  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.docTokens(spark, dir)
      .select(
        col("lang"),
        size(col("toks")).as("n_toks"),
        length(trim(col("text"))).as("n_chars_real"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("distinct_ratio"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_toks")), 2).as("avg_tokens"),
        round(avg(col("n_chars_real")), 2).as("avg_chars"),
        round(avg(col("distinct_ratio")), 6).as("avg_distinct_ratio"))
      .orderBy("lang")

  /** q_tfidf: exact term frequency / document frequency / tf-idf per
    * (doc, term). Two aggregations + a broadcast-able DF join; N docs is
    * a scalar broadcast. At 100 TB the (term) agg is the only wide
    * shuffle and is pre-combined map-side.
    */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.docTokens(spark, dir)
    // N-docs as a broadcast 1-row DF keeps the whole plan lazy (no
    // driver-side .first() — an eager scalar would serialize plan
    // construction at scale).
    val nDocs = broadcast(docs.agg(count(lit(1)).cast("double").as("n_docs")))
    val terms = docs
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term").crossJoin(nDocs)
      .select(
        col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
      .orderBy("doc_id", "term")
  }

  /** BM25 constants, shared with the DuckDB oracle. The oracle SQL
    * interpolates the Scala-COMPUTED values (k1+1, 1−b) rather than
    * writing its own literals: a double's shortest repr round-trips
    * exactly, so both engines are guaranteed the identical constants
    * for ANY caller-chosen k1/b — no reliance on a computed fold
    * happening to land on the same double as a hand-written literal. */
  val Bm25K1: Double = 1.2
  val Bm25B: Double  = 0.75
  /** The fixed query used by q_bm25 (terms present in the fixtures). */
  val Bm25Query: Seq[String] = Seq("join", "vector", "stream", "merge")

  /** Okapi BM25 relevance ranking of every document against a fixed
    * term query — the retrieval scorer that completes the tf-idf /
    * inverted-index family (score = Σ_t idf(t)·tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl)), idf = ln(1+(N−df+0.5)/(df+0.5))).
    *
    * Scale: corpus stats (N, avgdl) ride a broadcast 1-row DF (no
    * eager driver scalar); docs without any query term are pruned
    * BEFORE the explode by `arrays_overlap` against the broadcast
    * term list, so the exploded table is |hits| rows, not |tokens|;
    * the per-term df table is ≤|query| rows and broadcast into the
    * scoring join. The only wide shuffle is the (doc, term) tf
    * aggregate over matching docs, map-side combined. Top-k bounds
    * the output. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = Bm25K1, b: Double = Bm25B, topK: Int = 100): DataFrame = {
    val stats = broadcast(docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("toks"))).as("avgdl")))
    val hits = docs
      .where(arrays_overlap(col("toks"), lit(queryTerms.toArray)))
      .select(col("doc_id"), size(col("toks")).as("dl"),
              explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "term").crossJoin(stats)
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("wt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"), round(sum(col("wt")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** q_bm25: [[bm25]] of the documents corpus against [[Bm25Query]]. */
  def qBm25(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.docTokens(spark, dir), Bm25Query)
}
