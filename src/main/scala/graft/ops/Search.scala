package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Retrieval-search operators: hybrid lexical+dense rank fusion and
  * positional phrase matching — the query side of the RAG data path.
  * The corpus side (inverted index, chunking, ANN posting tables) is
  * [[Curation.invertedIndex]] / [[Curation.chunkDocs]] /
  * [[Similarity]]; these operators consume those signals to rank.
  */
object Search {

  /** RRF dampening constant (Cormack & Clarke & Buettcher, SIGIR 2009:
    * k = 60 is the published default and is remarkably robust). */
  val RrfK: Int = 60
  /** Fixed dense-probe vector id for q_hybrid_rrf (exists at every SF:
    * ScaleGen replica 0 keeps original ids). */
  val HybridProbeId: Long = 7L
  /** Per-system candidate-pool depth before fusion. */
  val HybridPoolK: Int = 100
  /** Fused result cut. */
  val HybridTopN: Int = 50

  /** Hybrid retrieval: Reciprocal Rank Fusion of a lexical (BM25) and
    * a dense (cosine-vs-probe) candidate pool —
    * `score(d) = Σ_s 1/(k + rank_s(d))` over the systems that
    * retrieved `d`. Rank-space fusion needs no score calibration
    * between BM25 logits and cosines, which is why RRF is the default
    * fuser in hybrid RAG stacks.
    *
    * Scale: each pool is produced by its own scale path (BM25 prunes
    * non-matching docs before exploding, [[Text.bm25]]; the dense side
    * is one broadcast probe row against a narrow normalized
    * projection — O(n) dots, no pair join) and is cut to `poolK`
    * BEFORE fusion, so the rank windows and the full-outer fusion join
    * run on ≤ 2·poolK rows on one partition — bounded by construction,
    * independent of corpus size. Ranks tie-break on rounded scores
    * then doc_id, so rank assignment is reproducible across engines.
    */
  def hybridRrf(docToks: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String] = Text.Bm25Query,
                probeId: Long = HybridProbeId,
                poolK: Int = HybridPoolK, rrfK: Int = RrfK,
                topN: Int = HybridTopN): DataFrame = {
    val lex = Text.bm25(docToks, queryTerms, topK = poolK)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id").asc)).as("lex_rank"))
    val u = Similarity.normalizeEmbeddings(embeddings)
    val probe = broadcast(
      u.where(col("vec_id") === probeId).select(col("vn").as("pv")))
    val dense = u.where(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(col("vec_id").as("doc_id"),
        round(VectorFunctions.dot(col("vn"), col("pv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
      .limit(poolK)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("cos_sim").desc, col("doc_id").asc)).as("dense_rank"))
    // rank 0 = "not retrieved by that system" (contributes nothing);
    // the CASE guards run BEFORE the sentinel can reach a divisor
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"))
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        round(
          when(col("lex_rank") === 0, lit(0.0))
            .otherwise(lit(1.0) / (col("lex_rank") + lit(rrfK))) +
          when(col("dense_rank") === 0, lit(0.0))
            .otherwise(lit(1.0) / (col("dense_rank") + lit(rrfK))), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topN)
  }

  /** q_hybrid_rrf: [[hybridRrf]] of the fixture corpus — BM25 over
    * [[Text.Bm25Query]] fused with cosine against probe vector
    * [[HybridProbeId]] (documents and embeddings share the id space). */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.docTokens(spark, dir), Tables.embeddings(spark, dir))

  /** The fixed phrase used by q_phrase_search (present in the fixture
    * corpus at every SF). */
  val Phrase: Seq[String] = Seq("big", "order", "scan")

  /** Positional phrase search: documents where `phrase` occurs as
    * CONSECUTIVE tokens, with occurrence count and first match
    * position (1-based). The match is evaluated entirely inside the
    * row by a native expression ([[graft.functions.PhrasePositions]],
    * one tight UTF8String scan per doc — r9; the higher-order-function
    * form paid Spark's interpreted per-element lambda dispatch), so
    * the operator is a narrow projection + filter: no explode, no
    * positional self-join, no shuffle before the output sort.
    * Overlapping occurrences count individually (positions advance by
    * 1, not by |p|). A 100 TB corpus scans once; the phrase literal
    * rides the plan, not a join.
    */
  def phraseSearch(docToks: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    // one tight per-row scan via the native expression
    // (graft.functions.PhrasePositions): the original
    // `filter(sequence(1, n), i -> slice(toks, i, |p|) == p)`
    // higher-order-function form ran each position through Spark's
    // INTERPRETED lambda path (~9 µs/position — 30 s for the sf1
    // corpus scan vs ~2 s here); same semantics, same outputs
    graft.functions.PhraseFunctions.register(docToks.sparkSession)
    val positions =
      graft.functions.PhraseFunctions.phrasePositions(col("toks"), phrase)
    docToks
      .select(col("doc_id"), positions.as("pos"))
      .where(size(col("pos")) > 0)
      .select(col("doc_id"),
              size(col("pos")).as("n_matches"),
              element_at(col("pos"), 1).as("first_pos"))
      .orderBy("doc_id")
  }

  /** q_phrase_search: [[phraseSearch]] for [[Phrase]]. */
  def qPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.docTokens(spark, dir), Phrase)

  /** Reranker readout weights: (rrf, coverage, query-tf, first-pos,
    * length-prior). Fixed, documented constants — a deterministic
    * feature-linear stand-in for the cross-encoder stage of a RAG
    * stack (the learned weights would arrive the same way DSIR's do:
    * as a tiny broadcast model artifact; the PIPELINE — pool join,
    * feature extraction, readout sort — is the part that must scale). */
  val RerankWeights: (Double, Double, Double, Double, Double) =
    (30.0, 1.0, 2.0, 0.5, 0.25)

  /** Feature-based reranking over the hybrid candidate pool — the
    * second retrieval stage: [[hybridRrf]] proposes `topN` candidates
    * cheaply, then each candidate is re-scored against richer
    * per-document evidence and re-ordered.
    *
    * Features (each deterministic, each rounded to 6 dp BEFORE the
    * readout so both engines combine identical operands):
    *   - `rrf`      — the stage-1 fused score (already 6 dp);
    *   - `cov`      — fraction of distinct query terms present;
    *   - `qtf`      — total query-term occurrences / doc length;
    *   - `pos_feat` — 1/first query-term position (0 if none: a
    *                  missing term must not outrank a position-1 hit);
    *   - `len_prior`— |ln(dl/avgdl)|, penalizing both stub-short and
    *                  run-on docs (subtracted).
    * rerank = w₁·rrf + w₂·cov + w₃·qtf + w₄·pos_feat − w₅·len_prior.
    *
    * Empty-token docs (dl = 0) CAN enter the pool through the dense
    * arm (no lexical-match requirement), so both dl-denominator
    * features use the documented greatest(dl, 1) convention — an
    * empty doc scores qtf 0 and the 1-token length prior — instead
    * of NULL features in Spark and an ln(0) ERROR in the DuckDB
    * oracle (r11 advice; the oracle mirrors the convention).
    *
    * Scale: the pool is ≤ `topN` rows and BROADCAST to the corpus
    * scan, so feature extraction is one narrow pruned pass over
    * docTokens (a broadcast hash join keeps only pool docs — no
    * shuffle of the corpus); avgdl is a map-side-combined scalar
    * broadcast back via 1-row cross join; the readout sort runs on
    * ≤ topN rows. Per-term features are fixed-size expression trees
    * (|query| is a plan-time constant), not per-element lambdas. */
  def rerank(docToks: DataFrame, embeddings: DataFrame,
             queryTerms: Seq[String] = Text.Bm25Query,
             probeId: Long = HybridProbeId,
             poolK: Int = HybridPoolK, rrfK: Int = RrfK,
             topN: Int = HybridTopN): DataFrame = {
    val (wRrf, wCov, wQtf, wPos, wLen) = RerankWeights
    val pool = hybridRrf(docToks, embeddings, queryTerms, probeId,
                         poolK, rrfK, topN)
      .select("doc_id", "rrf")
    // corpus-wide scalar: long lengths sum exactly in a double until
    // 2^53, so avgdl is order-independent and engine-identical
    val avg = docToks
      .agg((sum(size(col("toks")).cast("long")).cast("double") /
            count(lit(1))).as("avgdl"))
    val nTerms = queryTerms.size
    val covExpr = queryTerms
      .map(t => when(array_contains(col("toks"), t), 1).otherwise(0))
      .reduce(_ + _).cast("double") / nTerms
    val qtfExpr = queryTerms
      .map(t => size(filter(col("toks"), x => x === lit(t))))
      .reduce(_ + _).cast("double") / col("dl")
    // array_position: 0 = absent; least() skips nulls, so nullif
    // turns absences into nulls and coalesce restores the 0 sentinel
    // (least itself requires >1 args — a 1-term query skips it)
    val posCols = queryTerms.map(t =>
      nullif(array_position(col("toks"), lit(t)), lit(0L)))
    val firstPosExpr = coalesce(
      if (posCols.size == 1) posCols.head else least(posCols: _*),
      lit(0L))
    docToks.join(broadcast(pool), Seq("doc_id"))
      .crossJoin(broadcast(avg))
      .withColumn("dl", greatest(size(col("toks")).cast("double"), lit(1.0)))
      .withColumn("cov", round(covExpr, 6))
      .withColumn("qtf", round(qtfExpr, 6))
      .withColumn("first_pos", firstPosExpr)
      .withColumn("len_prior", round(abs(log(col("dl") / col("avgdl"))), 6))
      .withColumn("pos_feat",
        when(col("first_pos") === 0L, lit(0.0))
          .otherwise(round(lit(1.0) / col("first_pos"), 6)))
      .withColumn("rerank",
        round(lit(wRrf) * col("rrf") + lit(wCov) * col("cov") +
              lit(wQtf) * col("qtf") + lit(wPos) * col("pos_feat") -
              lit(wLen) * col("len_prior"), 6))
      .select(col("doc_id"), col("rrf"), col("cov"), col("qtf"),
              col("first_pos"), col("pos_feat"), col("len_prior"),
              col("rerank"))
      .orderBy(col("rerank").desc, col("doc_id").asc)
  }

  /** q_rerank: [[rerank]] of the hybrid pool — stage-2 of the
    * retrieval path (pool → features → readout). */
  def qRerank(spark: SparkSession, dir: String): DataFrame =
    rerank(Tables.docTokens(spark, dir), Tables.embeddings(spark, dir))
}
