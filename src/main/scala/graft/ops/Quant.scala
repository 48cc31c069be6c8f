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
    * pure narrow projection — one scan, no shuffle.
    *
    * r16 (guide §4): each plane's dot is the codegen
    * [[graft.functions.DotProduct]] over the once-cast double array —
    * the previous `aggregate(zip_with(...))` form ran 16 interpreted
    * per-element lambda chains per row (the 7x-slower HOF path the
    * int8 kernel comment documents). Bit-identical: float→double
    * widening is exact, and DotProduct sums (double)x·w ascending —
    * the same products in the same order as the left fold. The input
    * is widened (fixture = one split; no-op on a multi-split corpus).
    */
  def projectEmbeddings(embeddings: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(embeddings.sparkSession)
    val proj = array(Planes.map { plane =>
      round(graft.functions.VectorFunctions.dot(
        col("vd"), typedlit(plane.toSeq)), 6)
    }: _*)
    // fail fast on a dimension mismatch: a short embedding would
    // otherwise silently project from a truncated dot
    val guarded = when(size(col("vd")) === Dim, proj)
      .otherwise(raise_error(concat(
        lit(s"projectEmbeddings: expected $Dim-dim embedding, got "),
        size(col("vd")).cast("string"))))
    embeddings
      .select(col("vec_id"),
              col("embedding").cast("array<double>").as("vd"))
      .select(col("vec_id"), guarded.as("proj")).orderBy("vec_id")
  }

  /** q_embed_project: the [[projectEmbeddings]] projection on the
    * test corpus, emitted as one `(vec_id, dim, value)` row per output
    * dimension. The library API keeps the array shape
    * ([[projectEmbeddings]]); the registered query emits scalar
    * columns only, because the correctness gate's comparator sorts
    * on every column and cannot hash an array cell.
    *
    * r16 (guide §4): the scalar rows come from a broadcast cross join
    * against the 16-row (dim, plane) literal table with ONE codegen
    * dot per output row — the previous array-then-posexplode form put
    * the 16-dot array inside a Generate, which measured ~15x slower
    * end-to-end at sf0.1 (tools/ProjProbe: 1.8 s vs 0.11 s; the
    * Generate stage alone carried ~1 s regardless of sorts or
    * barriers). Same rows: dim is the plane index (0-based, the
    * posexplode position), value the identically-ordered dot, and the
    * raise_error dimension guard fires on the same inputs. */
  def qEmbedProject(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val planes = broadcast(
      Planes.zipWithIndex.map { case (p, i) => (i, p.toSeq) }.toSeq
        .toDF("dim", "plane"))
    val value = when(size(col("vd")) === Dim,
        round(graft.functions.VectorFunctions.dot(col("vd"), col("plane")), 6))
      .otherwise(raise_error(concat(
        lit(s"projectEmbeddings: expected $Dim-dim embedding, got "),
        size(col("vd")).cast("string"))))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vd"))
      .crossJoin(planes)
      .select(col("vec_id"), col("dim"), value.as("value"))
      .orderBy("vec_id", "dim")
  }

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
    graft.Tables.widen(graft.Tables.loadPath(spark, quantIndexPaths.get(spark, dir)),
      bytesPerTask = 64L << 10)
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

  // ------------------------------------------------------------------
  // Product quantization (r14, verdict ask #5): int8 is the 4× tier;
  // PQ is the 16-64× tier that makes 100 TB of embeddings fit cluster
  // RAM. d=64 vectors split into M=8 subvectors of 8 dims; each
  // subspace gets a K=256-centroid codebook (the standard PQ 8×8
  // geometry), trained by a join-argmin Lloyd loop that reuses
  // [[Clustering.lloyd]]'s exact-DECIMAL mean-carrier discipline (not
  // the lloyd function itself — its literal-argmin is a k≤8 shape;
  // see [[pqAssign]]), so codebooks are bit-deterministic, and a
  // vector's at-rest payload collapses to 8 one-byte codes — 8 bytes
  // vs int8's 64 ints + scale. Search is ASYMMETRIC (ADC): the probe
  // keeps full precision, builds one M×K lookup table of
  // subvector·centroid dots, and each candidate scores as 8 table
  // gathers + adds — no candidate-side decode ever.
  // ------------------------------------------------------------------

  /** PQ geometry: M subvectors × DSub dims, K centroids/subspace. */
  val PqM = 8
  val PqDSub = 8
  val PqK = 256
  val PqIters = 5

  /** PQ search geometry (r15): the PQ tier gets its OWN bucket space,
    * sized by TARGET OCCUPANCY (~[[PqOccupancy]] vectors per bucket,
    * h ≈ log2(n/B)) instead of the float/int8 tiers' √n-bucket
    * sizing — per-probe ADC candidates are then bounded at
    * ~T·(q+1)·B by construction, so the all-pairs self-kNN totals
    * O(n) and the declared ScaleCheck exponent is 1.0 by design (the
    * index REBUILD re-sizes the bucket space as n grows; candidates
    * per query do not). T/q/B/R set by the r15 PqTune sweep at sf0.1
    * (recall@3 vs exact kNN; full 18-point curve in SCALING.md):
    *   B=32: 0.74-0.85 across q/R — too coarse a shortlist source;
    *   B=64  q=4 R=80: 0.940 at ~2.2 s;
    *   B=128 q=3 R=80: 0.959 at ~2.9 s (+40% time for +2 pts).
    * B=64/q=4/R=80 is the chosen point — beating the int8 tier's
    * 0.948 is not the 8-byte tier's contract; bounded candidates
    * are. */
  val PqTables = 8
  val PqFlips = 4
  val PqOccupancy = 64L

  /** (vec_id, sub, v) — the per-subspace training/encoding projection
    * of the normalized posting vectors, SNAPPED to the 2⁻²⁶ grid:
    * normalization produces full-mantissa doubles that the Lloyd
    * exact-carrier guard (x·2⁵⁰ integral) rightly rejects, so PQ
    * quantizes its training/encoding inputs to 26 fraction bits first
    * — a ~1.5e-8 perturbation, noise next to 4-bit codes, and the
    * carrier then holds by construction. */
  private def pqSubvecs(vecs: DataFrame): DataFrame = {
    val G = 67108864.0 // 2^26
    vecs.select(col("vec_id"), posexplode(array(
        (0 until PqM).map(j =>
          slice(col("vn"), j * PqDSub + 1, PqDSub)): _*))
      .as(Seq("sub", "sv")))
      .select(col("vec_id"), col("sub"),
              transform(col("sv"),
                x => floor(x.cast("double") * lit(G) + lit(0.5)) / lit(G))
                .as("v"))
  }

  /** Argmin-over-codebook as a BROADCAST JOIN (subvectors × their
    * subspace's K centroids, deterministic min(struct(d2, cid))
    * tie-break) — one bounded job regardless of K. The literal-
    * struct-array argmin [[Clustering.assign]] uses is right for
    * k=8 but at K=256 the 2048-term expression costs seconds of
    * codegen PER JOB; the join form keeps codegen constant-size and
    * is the shape that scales (centroid table is M·K rows —
    * broadcast by construction). */
  private def pqAssign(sv: DataFrame, books: DataFrame): DataFrame = {
    val d2 = graft.functions.VectorFunctions.dot(col("v"), col("v")) -
      lit(2.0) * graft.functions.VectorFunctions.dot(col("v"), col("c")) +
      col("c2")
    sv.join(broadcast(books), "sub")
      .select(col("vec_id"), col("sub"), col("v"),
              struct(d2.as("d2"), col("cid")).as("sc"))
      .groupBy("vec_id", "sub")
      .agg(min(col("sc")).getField("cid").as("code"),
           first(col("v")).as("v"))
  }

  /** Content-keyed PQ index: trains the M codebooks with a
    * fixed-iteration Lloyd loop over a deterministic hash-SAMPLE of
    * the corpus (≤ ~4k vectors — the standard PQ practice; codebook
    * quality saturates long before full-corpus training, and the
    * sample bounds train cost at any corpus size), encodes EVERY
    * vector with one join-argmin pass, and materializes
    * codebook.parquet (M·K rows — model state) plus the PQ posting
    * table. At-rest layout: the 8 one-byte codes PACKED into one
    * LONG word (code_j in bits 8j..8j+7) — a fixed-width column
    * parquet stores tightly, vs an array<int> paying per-element
    * overhead; this is what makes the ≤¼-of-int8 size contract hold
    * even where row keys dominate. Home-side index only: no pm
    * column (probe masks live on the probe side, which reads the
    * float index). */
  private val pqIndexPaths =
    new IndexCache[String]("embeddings", { (s, d) =>
      buildPqIndex(s, d, PqTables, PqFlips, PqOccupancy)
    })

  /** The PQ index build, parameterized for the [[graft.tools.PqTune]]
    * sweep: trains the codebooks, builds the occupancy-sized bucket
    * space, and writes three artifacts — codebook.parquet (M·K rows,
    * model state), postings.parquet (tbl, bucket, vec_id, code64 —
    * the at-rest RAM-tier table the ≤¼-of-int8 size golden measures),
    * and probes.parquet (vec_id, tbl, bucket, pm — probe routing; in
    * production this is computed per QUERY vector at query time, it
    * is materialized here only because the benchmark's query set is
    * the corpus itself). */
  private[graft] def buildPqIndex(s: SparkSession, d: String,
                                  tables: Int, flips: Int,
                                  occupancy: Long): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_pq").toString
      import s.implicits._
      // one narrow scan of the embeddings table — NOT a distinct()
      // over the float index's n·T posting rows (same vn values: the
      // postings' vn column is this very expression)
      val vecs = Similarity.normalized(s, d)
      val n = vecs.count()
      // deterministic ~4k-vector training sample by HASH of vec_id —
      // id-agnostic, unlike `vec_id % stride`, which grossly
      // under-samples any sparse or offset id domain (ids all ≡ 1
      // mod stride would sample NOTHING). md5-low60 mod 2^20 < frac
      // gives every id the same inclusion probability whatever the
      // id distribution looks like.
      val keepBelow = math.min(1L << 20, math.max(1L, (4096.0 / n * (1 << 20)).toLong))
      val sampled = vecs.filter(
        pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 15),
                  16, 10).cast("long"), lit(1L << 20)) < lit(keepBelow))
      val train = pqSubvecs(sampled).persist()
      try {
        // init: the K lowest sampled vec_ids' subvectors, per subspace
        var books: Map[(Int, Int), Seq[Double]] =
          train.select(col("sub"), col("vec_id"), col("v"))
            .withColumn("rn", row_number().over(
              Window.partitionBy("sub").orderBy("vec_id")))
            .filter(col("rn") <= PqK)
            .collect()
            .map(r => ((r.getInt(0), r.getInt(3) - 1), r.getSeq[Double](2)))
            .toMap
        require(books.nonEmpty,
          s"pq codebook init: hash sample of the $n-vector corpus came " +
            "back empty — corpus has no vectors (an empty embeddings " +
            "table upstream), since hash sampling keeps >=1 in expectation " +
            "for any non-empty id domain")
        def booksDf = books.toSeq
          .map { case ((j, c), v) => (j, c, v, v.map(x => x * x).sum) }
          .toDF("sub", "cid", "c", "c2")
        // Lloyd over the sample: join-argmin assign + the exact 2^50
        // DECIMAL mean carrier (subvectors are 2^-26-grid-snapped, so
        // the carrier holds by construction — see pqSubvecs)
        val S = 1125899906842624.0 // 2^50
        for (_ <- 1 to PqIters) {
          val means = pqAssign(train, booksDf)
            .select(col("sub"), col("code"),
                    posexplode(col("v")).as(Seq("dd", "x")))
            .groupBy("sub", "code", "dd")
            .agg(sum((col("x") * S).cast("decimal(38,0)")).as("sx"),
                 count(lit(1)).as("nn"))
            .select(col("sub"), col("code"), col("dd"),
                    (col("sx").cast("double") / (lit(S) * col("nn"))).as("m"))
            .collect()
            .groupBy(r => (r.getInt(0), r.getInt(1)))
            .map { case (k, rows) =>
              val c = new Array[Double](PqDSub)
              rows.foreach(r => c(r.getInt(2)) = r.getDouble(3))
              k -> c.toSeq
            }
          books = books.map { case (k, old) => k -> means.getOrElse(k, old) }
        }
        booksDf.withColumnRenamed("c", "centroid").drop("c2")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/codebook.parquet")
        // encode EVERY vector: one join-argmin pass, codes bit-packed
        // (bit_or + shiftleft, NOT arithmetic: code_7 << 56 lands in
        // the sign bit, which ANSI multiplication rejects as overflow)
        val codes = pqAssign(pqSubvecs(vecs), booksDf)
          .groupBy("vec_id")
          .agg(expr("bit_or(shiftleft(CAST(code AS BIGINT), 8 * sub))")
            .as("code64"))
        // the PQ tier's OWN occupancy-sized bucket space (see
        // [[PqOccupancy]]) — NOT the float index's √n buckets
        val idx = Similarity.annIndex(vecs, n, tables, flips,
            targetOccupancy = Some(occupancy))
          .persist()
        try {
          idx.select(col("tbl"), col("bucket"), col("vec_id"))
            .join(codes, "vec_id")
            .write.mode("overwrite").parquet(s"$dir/postings.parquet")
          idx.select(col("vec_id"), col("tbl"), col("bucket"), col("pm"))
            .write.mode("overwrite").parquet(s"$dir/probes.parquet")
        } finally { idx.unpersist(false); () }
        dir
      } finally { train.unpersist(false); () }
  }

  private[graft] def pqPostings(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadPath(spark, s"${pqIndexPaths.get(spark, dir)}/postings.parquet")
  private[graft] def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadPath(spark, s"${pqIndexPaths.get(spark, dir)}/codebook.parquet")
  private[graft] def pqIndexPath(spark: SparkSession, dir: String): String =
    s"${pqIndexPaths.get(spark, dir)}/postings.parquet"

  /** Incremental PQ encode: NEW vectors (vec_id, vn) coded against
    * the corpus' FROZEN codebook — the append path of the PQ index
    * (the [[graft.ops.Curation.stableShard]] stability property for
    * vector search): appending vectors can never move an existing
    * vector's codes, because the codebook is a materialized artifact
    * of the original corpus fingerprint. One join-argmin pass;
    * returns (vec_id, code64) rows ready to union into the posting
    * table. Re-training (a new codebook generation) is a deliberate,
    * whole-index event — exactly how production PQ deployments
    * version codebooks. */
  def encodePqAgainst(spark: SparkSession, dir: String,
                      vecs: DataFrame): DataFrame = {
    import spark.implicits._
    val books = pqCodebook(spark, dir)
      .select(col("sub"), col("cid"),
              transform(col("centroid"), x => x.cast("double")).as("c"))
      .withColumn("c2", graft.functions.VectorFunctions.dot(col("c"), col("c")))
    pqAssign(pqSubvecs(vecs), books)
      .groupBy("vec_id")
      .agg(expr("bit_or(shiftleft(CAST(code AS BIGINT), 8 * sub))")
        .as("code64"))
  }

  /** ADC shortlist depth before the exact refine (r15 PqTune: deeper
    * shortlists are where PQ recall actually lives — R=30→80 bought
    * +0.10 recall at ~equal wall time; refine cost stays ≤ R exact
    * dots per probe, linear in n for the all-pairs benchmark). */
  val PqRefineR = 80

  /** q_ann_pq: approximate per-vector top-3 neighbors from the PQ
    * posting table — the full IVFADC+R architecture: the q_ann_ivf
    * multi-probe candidate generation, ASYMMETRIC-distance scoring
    * (each probe precomputes its M·K=2048-entry LUT of
    * subvector·centroid dots ONCE, before the join multiplies rows;
    * each candidate pair then costs 8 static gathers + adds off the
    * packed code word — no HOF, no per-pair allocation), an ADC
    * top-[[PqRefineR]] cut, and an EXACT-dot refine of only the
    * shortlist (≤ R rows per probe — in production the refine tier
    * point-reads full-precision vectors from slow storage; the PQ
    * codes are what lives in RAM and what the candidate stream
    * touches). Oracle-exempt (approximate by construction, like its
    * int8 sibling); golden: recall floor vs exact kNN + at-rest
    * payload ≤ ¼ of the int8 posting table (QuantSpec). */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame =
    annPqFrom(spark, dir, pqIndexPaths.get(spark, dir), PqRefineR)

  /** Collected-codebook memo (r17): the codebook is a FROZEN index
    * artifact (a new corpus fingerprint lands in a new temp dir), so
    * collecting its 2048 rows back to the driver on EVERY query
    * execution (~150 ms of job + row conversion, ConstructProbe) is
    * pure re-resolution — the Tables.load rationale applied to model
    * state. Keyed by the index dir path; values are plain Scala data. */
  private val codebookMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, Map[(Int, Int), Seq[Double]]]()

  /** The IVFADC+R search over a given PQ index dir, parameterized for
    * the [[graft.tools.PqTune]] sweep. */
  private[graft] def annPqFrom(spark: SparkSession, dir: String,
                               idxDir: String, refineR: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    if (codebookMemo.size() > 64) codebookMemo.clear()
    val cb = codebookMemo.computeIfAbsent(idxDir, p =>
      spark.read.parquet(s"$p/codebook.parquet").collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
        .toMap)
    // Spark-native ADC: a per-probe LUT is the serial-CPU trick — in a
    // distributed plan a 2048-double LUT riding every exploded probe
    // row through two shuffles is the anti-pattern. Instead each
    // POSTING row decodes its approximation vector ĉ once at scan
    // time (8 element_at gathers off the centroid literals, one per
    // packed byte of code64), and the pair kernel becomes the same
    // codegen'd native dot as the int8 path: dot(p, ĉ) =
    // Σ_j p_j·c_{code_j} — identical ADC math, no HOF, no per-pair
    // allocation, and the at-rest table still holds only the 8-byte
    // words (the decode is a transient scan projection, so the
    // candidate-stream payload matches int8's, while disk/RAM at
    // rest stay at the 8-byte PQ tier).
    val decodeCol = flatten(array((0 until PqM).map { j =>
      val cbJ = typedlit(
        (0 until PqK).map(c => cb.getOrElse((j, c), Seq.fill(PqDSub)(0.0))))
      val code = shiftrightunsigned(col("code64"), 8 * j)
        .bitwiseAND(lit(255L)).cast("int")
      element_at(cbJ, code + lit(1))
    }: _*))
    // widen (r16): the posting table lands as a single split at test
    // scale, which serialized the whole decode+ADC scan on one task
    val posts = graft.Tables.widen(
      graft.Tables.loadPath(spark, s"$idxDir/postings.parquet"))
    val home = posts.select(col("tbl"), col("bucket"),
                            col("vec_id").as("id_b"),
                            decodeCol.as("cdec"))
    // probe routing comes from the PQ tier's OWN bucket space
    // (probes.parquet); the full-precision probe vector joins in by
    // id from ONE narrow embeddings scan (Similarity.normalized —
    // not a distinct() over the float index's n·T posting rows)
    val probes = graft.Tables.widen(
        graft.Tables.loadPath(spark, s"$idxDir/probes.parquet"))
      .join(Similarity.normalized(spark, dir)
              .select(col("vec_id"),
                      transform(col("vn"), x => x.cast("double")).as("va")),
            "vec_id")
      .select(col("vec_id").as("id_a"), col("va"), col("tbl"),
              explode(transform(col("pm"), m => col("bucket").bitwiseXOR(m)))
                .as("bucket"))
    val adc = graft.functions.VectorFunctions.dot(col("va"), col("cdec"))
    val cands = probes.join(home, Seq("tbl", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), adc.as("cos_sim"))
    // ADC shortlist → exact refine: only ≤ R rows per probe ever touch
    // full-precision vectors again
    val short = Similarity.topKCut(cands, refineR, distinct = true)
      .select("id_a", "id_b")
    val vecs = Similarity.normalized(spark, dir)
      .select(col("vec_id"), transform(col("vn"), x => x.cast("double"))
        .as("vd"))
    val exact = short
      .join(vecs.select(col("vec_id").as("id_a"), col("vd").as("va")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("vd").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
              graft.functions.VectorFunctions.dot(col("va"), col("vb"))
                .as("cos_sim"))
    val w = Window.partitionBy("id_a")
      .orderBy(col("cos_sim").desc, col("id_b").asc)
    exact.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy(col("id_a"), col("cos_sim").desc, col("id_b"))
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
