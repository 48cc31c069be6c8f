package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Int8 scalar quantization of embedding vectors, plus a quantized
  * dot-product top-k search over the quantized corpus — the memory
  * side of the ANN story: at 100 TB of embeddings, 4 bytes/dim of
  * float32 is the dominant storage and shuffle cost, and per-vector
  * symmetric int8 quantization (`q_i = round(x_i * 127 / max|x|)`,
  * one float scale kept per vector) cuts it 4x while keeping the
  * dot product an INTEGER kernel (SIMD-friendly, exactly
  * reproducible) that is descaled back to an approximate float dot
  * at the very end.
  *
  * Engineering contract (same as [[Html]]/[[Url]]): every arithmetic
  * step is expressed identically on the Spark side and in the DuckDB
  * oracle — `floor(x * (127.0 / max_abs) + 0.5)` instead of `round`
  * (HALF_UP vs banker's rounding is the one way the two engines could
  * silently diverge), and the candidate ranking happens on the raw
  * IEEE-754 double descale (bit-identical on both sides) with a
  * `vec_id` tiebreak, so the top-k cut is deterministic.
  *
  * Scale shape: quantization is a pure narrow projection (one scan,
  * no shuffle); the search probes are broadcast against the quantized
  * corpus, so the quadratic term is |probes| x |corpus| with a 16x
  * cheaper inner kernel than the float path and no corpus shuffle.
  * The sub-linear-candidate path composes with [[Similarity]]'s IVF
  * buckets (quantize the posting lists); this operator is the
  * storage/kernel half.
  */
object Quant {

  /** Per-vector symmetric int8 quantization over any
    * (vec_id, embedding: array&lt;float&gt;) DataFrame:
    * (vec_id, qvec: array&lt;int&gt; in [-127,127], max_abs: float).
    * A zero vector quantizes to all zeros (scale 0). */
  def quantizeEmbeddings(embeddings: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(col("embedding"), x => abs(x)))
    embeddings
      .select(col("vec_id"), col("embedding"), maxAbs.as("max_abs"))
      .withColumn("scale",
        when(col("max_abs") > 0f, lit(127.0) / col("max_abs"))
          .otherwise(lit(0.0)))
      .select(
        col("vec_id"),
        transform(col("embedding"),
          x => floor(x * col("scale") + lit(0.5)).cast("int")).as("qvec"),
        col("max_abs"))
  }

  /** Integer dot product of two int vectors as a long — the whole
    * inner kernel of the quantized search (codegen'd
    * `zip_with`/`aggregate`, no UDF). */
  private[graft] def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y),
              lit(0L), (acc, v) => acc + v)

  /** Quantized approximate-dot top-k: quantize the corpus once,
    * broadcast the first `nProbes` vectors as probes, rank the
    * corpus per probe by the descaled integer dot
    * `qdot * (max_abs_p/127) * (max_abs_c/127)`.
    * Returns (probe_id, vec_id, qdot, approx_dot, rnk), ordered. */
  def quantizedTopK(embeddings: DataFrame, nProbes: Int = 5,
                    k: Int = 10): DataFrame = {
    val q = quantizeEmbeddings(embeddings)
    val probes = q.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("qvec").as("pvec"),
              col("max_abs").as("max_abs_p"))
    val descaled =
      col("qdot").cast("double") *
        (col("max_abs_p") / lit(127.0)) * (col("max_abs") / lit(127.0))
    val pairs = q
      .join(broadcast(probes), col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
              qdot(col("pvec"), col("qvec")).as("qdot"),
              col("max_abs_p"), col("max_abs"))
      .select(col("probe_id"), col("vec_id"), col("qdot"),
              descaled.as("approx"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("approx").desc, col("vec_id").asc)
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id"), col("qdot"),
              round(col("approx"), 6).as("approx_dot"), col("rnk"))
      .orderBy("probe_id", "rnk")
  }

  /** q_embed_quant: [[quantizedTopK]] on the test corpus. */
  def qEmbedQuant(spark: SparkSession, dir: String): DataFrame =
    quantizedTopK(Tables.embeddings(spark, dir))

  // ------------------------------------------------------------------
  // Johnson–Lindenstrauss random projection: 64 → 16 dims. The other
  // half of the embedding-footprint story (quantization cuts bytes
  // per dim; projection cuts dims) — the standard preprocessing
  // before ANN indexing at scale. The projection matrix is a FIXED
  // seeded Gaussian scaled by 1/√k (the shipped-artifact model, like
  // the BPE merge table), so results are deterministic and the DuckDB
  // oracle can embed the same literal matrix. Both engines fold the
  // per-dimension dot product LEFT-TO-RIGHT over the input array
  // (Spark `aggregate`, DuckDB `list_sum` over an ordered
  // `list_transform`), so the doubles are bit-identical before the
  // final display rounding.
  // ------------------------------------------------------------------

  /** Input/output dims of the fixture projection. */
  val Dim = 64
  val ProjDim = 16

  /** Seeded Gaussian planes, scaled 1/√k. */
  private[graft] val Planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(7)
    val s = 1.0 / math.sqrt(ProjDim.toDouble)
    Array.fill(ProjDim)(Array.fill(Dim)(rng.nextGaussian() * s))
  }

  /** JL-project any (vec_id, embedding: array&lt;float&gt;) DataFrame to
    * [[ProjDim]] dims: (vec_id, proj), rounded 6 dp for display. A
    * pure narrow projection — one scan, no shuffle. */
  def projectEmbeddings(embeddings: DataFrame): DataFrame = {
    val proj = array(Planes.map { plane =>
      val p = typedlit(plane.toSeq)
      round(aggregate(
        zip_with(col("embedding"), p, (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v), 6)
    }: _*)
    // fail fast on a dimension mismatch: zip_with null-pads the
    // shorter side, which would silently project every row to nulls
    val guarded = when(size(col("embedding")) === Dim, proj)
      .otherwise(raise_error(concat(
        lit(s"projectEmbeddings: expected $Dim-dim embedding, got "),
        size(col("embedding")).cast("string"))))
    embeddings.select(col("vec_id"), guarded.as("proj")).orderBy("vec_id")
  }

  /** q_embed_project: [[projectEmbeddings]] on the test corpus,
    * posexploded to one `(vec_id, dim, value)` row per output
    * dimension. The library API keeps the array shape
    * ([[projectEmbeddings]]); the registered query emits scalar
    * columns only, because the correctness gate's comparator sorts
    * on every column and cannot hash an array cell. */
  def qEmbedProject(spark: SparkSession, dir: String): DataFrame =
    projectEmbeddings(Tables.embeddings(spark, dir))
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
      .orderBy("vec_id", "dim")

  // ------------------------------------------------------------------
  // Quantized-posting ANN: the q_ann_ivf bucket structure with INT8
  // posting payloads — the composition the two halves exist for. The
  // quantized posting table is materialized per corpus (same
  // content-keyed lifecycle as the float index); at rest the payload
  // is the same 64 dims but int8-valued ints (parquet bit-packs the
  // narrow value range) plus one double scale, vs 64 float64 — the
  // golden asserts the conservative < ½ bytes, measured closer to 4×
  // on the value encoding alone. The query-side verify kernel is the
  // integer dot, descaled once per candidate. Recall loss from int8
  // on a normalized vector is negligible (the golden pins it against
  // exact kNN).
  // ------------------------------------------------------------------

  private val quantIndexPaths =
    new IndexCache[String]("embeddings", { (s, d) =>
      val p = java.nio.file.Files
        .createTempDirectory("graft_ann_qindex").toString + "/qpostings.parquet"
      val scale = when(col("max_abs") > 0d, lit(127.0) / col("max_abs"))
        .otherwise(lit(0.0))
      Similarity.annPostings(s, d)
        .withColumn("max_abs",
          array_max(transform(col("vn"), x => abs(x))).cast("double"))
        .select(col("tbl"), col("bucket"), col("pm"), col("vec_id"),
                transform(col("vn"),
                  x => floor(x * scale + lit(0.5)).cast("int")).as("qvec"),
                col("max_abs"))
        .write.mode("overwrite").parquet(p)
      p
    })

  private[graft] def quantPostings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(quantIndexPaths.get(spark, dir))
  private[graft] def quantIndexPath(spark: SparkSession, dir: String): String =
    quantIndexPaths.get(spark, dir)

  /** q_ann_quant: approximate per-vector top-3 neighbors from the
    * QUANTIZED posting table — same multi-probe candidate generation
    * as q_ann_ivf, integer-dot verify. Oracle-exempt (approximate);
    * golden: recall vs exact kNN + the at-rest size ratio. */
  def qAnnQuant(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    // int8 values are stored as ints at rest (that is the size win);
    // for the candidate kernel they are widened to double ONCE PER
    // POSTING ROW (before the join multiplies rows) so the per-pair
    // work is the same codegen'd DotProduct as the float path — the
    // zip_with/aggregate HOF form runs interpreted with a per-pair
    // array allocation and measured 7x slower at sf0.1. Values ≤ 127
    // make every product and sum exact in double.
    val codes = quantPostings(spark, dir)
      .withColumn("qd", transform(col("qvec"), x => x.cast("double")))
    val home = codes.select(col("tbl"), col("bucket"),
                            col("vec_id").as("id_b"), col("qd").as("q_b"),
                            col("max_abs").as("ma_b"))
    val probes = codes.select(
      col("tbl"), col("vec_id").as("id_a"), col("qd").as("q_a"),
      col("max_abs").as("ma_a"),
      explode(transform(col("pm"), m => col("bucket").bitwiseXOR(m)))
        .as("bucket"))
    val approxCos =
      graft.functions.VectorFunctions.dot(col("q_a"), col("q_b")) *
        (col("ma_a") / lit(127.0)) * (col("ma_b") / lit(127.0))
    val cands = probes.join(home, Seq("tbl", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), approxCos.as("cos_sim"))
    Similarity.topKCut(cands, 3, distinct = true)
      .withColumn("cos_sim", round(col("cos_sim"), 6))
  }

  /** DuckDB oracle: the literal same planes (full-precision literals
    * round-trip to the same doubles) folded in the same order. */
  val projectOracleSql: String = {
    // each output dim gets its plane as an inline list literal
    // (Double.toString round-trips to the identical bits on parse);
    // list_sum over the ordered list_transform folds left-to-right,
    // matching Spark's `aggregate` (the q_dedup_embed cos_sim
    // precedent)
    val cols = Planes.map { plane =>
      // ::DOUBLE[] — a bare numeric list literal parses as DECIMAL[]
      // in DuckDB, which would run the fold in decimal arithmetic
      val lit = plane.mkString("[", ", ", "]::DOUBLE[]")
      s"round(CAST(CAST(list_sum(list_transform(generate_series(1, $Dim), " +
        s"i -> embedding[i] * ($lit)[i])) AS VARCHAR) AS DECIMAL(38,18)), 6)::DOUBLE"
    }.mkString(",\n  ")
    // parallel unnest (the q_embed_outlier precedent) zips the value
    // list with its 1-based positions — emitted 0-based to match
    // Spark's posexplode, ::INT to match posexplode's IntegerType
    s"""WITH p AS (SELECT vec_id, [
       |  $cols
       |] AS proj
       |FROM embeddings)
       |SELECT vec_id,
       |  (unnest(generate_series(1, $ProjDim)) - 1)::INT AS dim,
       |  unnest(proj) AS value
       |FROM p ORDER BY vec_id, dim""".stripMargin
  }

  /** DuckDB oracle: the LITERAL same arithmetic (floor(x*scale+0.5)
    * quantize, integer dot, identical descale association), so the
    * integer columns hash-match exactly and the double ranking is
    * bit-identical. */
  // every 127.0 literal is ::DOUBLE — DuckDB otherwise types it
  // DECIMAL and runs the FLOAT max_abs arithmetic in single
  // precision, which diverged from Spark's double math by 2e-8 at
  // sf1 and flipped a 6-dp rounding (CORRECTNESS-sf1 round-8 find)
  val oracleSql: String =
    """WITH q AS (
      |  SELECT vec_id, max_abs,
      |    CASE WHEN max_abs > 0 THEN 127.0::DOUBLE / max_abs
      |         ELSE 0.0::DOUBLE END AS scale,
      |    embedding
      |  FROM (SELECT vec_id, embedding,
      |          list_max(list_transform(embedding, x -> abs(x))) AS max_abs
      |        FROM embeddings)),
      |qv AS (
      |  SELECT vec_id, max_abs,
      |    list_transform(embedding,
      |      x -> CAST(floor(x * scale + 0.5::DOUBLE) AS INT)) AS qvec
      |  FROM q),
      |p AS (SELECT vec_id AS probe_id, qvec AS pvec, max_abs AS max_abs_p
      |      FROM qv WHERE vec_id < 5),
      |d AS (
      |  SELECT probe_id, vec_id,
      |    CAST(list_dot_product(pvec, qvec) AS BIGINT) AS qdot,
      |    CAST(list_dot_product(pvec, qvec) AS DOUBLE)
      |      * (CAST(max_abs_p AS DOUBLE) / 127.0::DOUBLE)
      |      * (CAST(max_abs AS DOUBLE) / 127.0::DOUBLE) AS approx
      |  FROM qv CROSS JOIN p WHERE vec_id <> probe_id),
      |r AS (
      |  SELECT probe_id, vec_id, qdot, approx,
      |    row_number() OVER (PARTITION BY probe_id
      |                       ORDER BY approx DESC, vec_id) AS rnk
      |  FROM d)
      |SELECT probe_id, vec_id, qdot,
      |  round(CAST(CAST(approx AS VARCHAR) AS DECIMAL(38,18)), 6)::DOUBLE
      |    AS approx_dot, rnk::INT AS rnk
      |FROM r WHERE rnk <= 10
      |ORDER BY probe_id, rnk""".stripMargin
}
