package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry class-initialization smoke test (r10 verdict ask #2).
  *
  * Round 10 shipped a forward reference inside `Queries.<clinit>`:
  * an oracle entry in an early map interpolated `qualityCtes`, which
  * read `langLists` — a `val` declared *after* that map — and got
  * `null` mid-initialization, killing the entire 208-query registry
  * with `ExceptionInInitializerError` before any gate could run.
  *
  * This spec forces full evaluation of every registry map and every
  * oracle SQL string, so any future initialization-order bug fails
  * `sbt test` immediately instead of surfacing in the driver's
  * Verify/Bench run. No SparkSession needed — this is pure clinit.
  */
class RegistryClinitSpec extends AnyFunSuite {

  test("Queries registry initializes and is non-trivial") {
    assert(Queries.all.size >= 200, s"registry shrank: ${Queries.all.size}")
  }

  test("every oracle SQL string materializes non-null and non-empty") {
    // Interpolations like $qualityCtes run at map construction; a
    // forward-referenced null val would leave the literal "null" (or
    // throw). Assert both never happen.
    // a null Scala string interpolates as the literal token "null":
    // as the whole SQL, as a bare line (a null CTE-chain val), or
    // glued to WITH/comma (inline interpolation). Legitimate SQL uses
    // uppercase NULL, so the lowercase-token probes are safe.
    val nullArtifact = java.util.regex.Pattern.compile(
      "(?m)^\\s*null\\s*,?\\s*$|\\bWITH null\\b|,\\s*null\\s*,")
    Queries.oracle.foreach { case (name, sql) =>
      assert(sql != null && sql.trim.nonEmpty, s"$name oracle is empty")
      assert(!sql.startsWith("null") && !nullArtifact.matcher(sql).find(),
        s"$name oracle embeds a null interpolation")
    }
    Queries.oracleSf1.foreach { case (name, (sql, where)) =>
      assert(sql != null && sql.trim.nonEmpty, s"$name sf1 oracle is empty")
      assert(where != null, s"$name sf1 where is null")
    }
    // an sf1 override must override a PRIMARY oracle — an orphan entry
    // would silently never run in either gate
    val orphans = Queries.oracleSf1.keySet -- Queries.oracle.keySet
    assert(orphans.isEmpty, s"sf1 overrides without a primary oracle: $orphans")
  }

  test("oracle-exempt set matches the declared exemption list") {
    val exempt = Queries.all.keySet -- Queries.oracle.keySet
    val declared = Set(
      // q_dedup_simhash and q_embed_pca left this set in r12 (md5-low64
      // token hash; power iteration unrolled as a recursive CTE over
      // the oracle-exact covariance); q_dedup_near and
      // q_dedup_incr_near followed once the MinHash pipeline went
      // fully engine-independent (md5 shingles, interpolated perm
      // constants, md5 band keys)
      // q_kmeans converted later in r12: the update means moved to the
      // exact 2^50 DECIMAL carrier (order-independent), and the whole
      // 5-iteration Lloyd run unrolls in SQL (kmeansOracleSql)
      // q_bloom_decontaminate converted later in r12: the sketch
      // rebuilt on Md5Bloom's engine-independent primitives, so the
      // oracle reproduces the exact bit pattern, FPs included
      // q_multimodal_features converted in r14: four analytic
      // container fixtures through the real dispatch, SHA-256 stub
      // dims replayed via DuckDB's sha256
      // q_ann_pq added in r14: PQ is approximate by construction like
      // its int8 sibling; recall + at-rest-size goldens in QuantSpec
      "q_agg_approx", "q_ann_ivf", "q_ann_pq",
      "q_percentiles_approx", "q_token_bpe", "q_bpe_learn", "q_ann_quant",
      "q_hll_users")
    // Exemptions may grow only deliberately: fail on silent drift so a
    // lost oracle entry is caught at test time, not in the driver gate.
    assert(exempt == declared,
      s"exempt drift: undeclared=${exempt -- declared} missing=${declared -- exempt}")
  }

  test("SparkEntry surface loads without a SparkSession") {
    assert(SparkEntry.queries.size == Queries.all.size)
    assert(SparkEntry.oracleSql.size == Queries.oracle.size)
  }
}
