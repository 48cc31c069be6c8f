package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split (on by default)
  * handles most runtime skew; explicit salting remains the tool when a
  * single join key dominates so heavily that even split partitions
  * overwhelm one executor (the classic hot-key fact⋈fact join at
  * 100 TB), or when AQE is unavailable (streaming joins).
  */
object Skew {

  /** Salted equi-join: the skewed (large, hot-keyed) side gets a random
    * salt in [0, buckets); the small side is replicated `buckets` times
    * via explode; the join key becomes (key, salt) — spreading each hot
    * key over `buckets` reducers. Result equals `skewed.join(other,
    * keys, "inner")` exactly; only the partitioning changes.
    *
    * The salt is `pmod(hash(monotonically_increasing_id()), buckets)` —
    * deterministic per physical row placement but NOT stable across
    * retries; do not make query RESULTS depend on the salt column (it
    * is dropped here).
    */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame,
                      key: String, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val s = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    // SHUFFLE_HASH, deliberately (r17, guide §3.1): salting exists to
    // spread a SHUFFLE join's hot key across buckets — when Catalyst
    // instead broadcasts the ×buckets-replicated side, the driver
    // serially collects and hash-builds `buckets` copies of the dim
    // table (~1 s at sf0.1) and the salt buys nothing. Forcing the
    // shuffled hash join keeps the replicated build distributed;
    // per-partition build side is |other| · buckets / shuffle-width
    // rows. Result rows are identical under any strategy.
    s.join(o.hint("shuffle_hash"), Seq(key, "__salt"), "inner").drop("__salt")
  }
}
