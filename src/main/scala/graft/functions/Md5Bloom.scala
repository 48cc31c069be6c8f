package graft.functions

/** Deterministic, engine-independent Bloom-filter primitives (r12 —
  * the conversion that moved q_bloom_decontaminate off the
  * golden-exempt list, the md5-low64 simhash/MinHash precedent
  * applied to a sketch).
  *
  * Spark's `DataFrameStatFunctions.bloomFilter` hashes with a
  * JVM-internal murmur variant, so its bit pattern — and therefore its
  * false-positive set — exists only inside Spark. These primitives
  * rebuild the same sketch from PUBLISHED pieces so a second engine
  * can reproduce it bit-for-bit:
  *
  *   - h1 / h2 = little-endian u64 of MD5 digest bytes 8..15 / 0..7 —
  *     exactly DuckDB's `md5_number_lower` / `md5_number_upper`
  *     (verified empirically; the simhash precedent already pins the
  *     lower half);
  *   - probe positions by Kirsch–Mitzenmacher double hashing,
  *     pos_i = (h1 + i·h2) mod m for i in [0, k), with h1, h2 first
  *     reduced mod m in UNSIGNED arithmetic (`Long.remainderUnsigned`
  *     ≡ UBIGINT `%`), keeping every intermediate < 2·k·m — no
  *     overflow on either engine;
  *   - integer-exact sizing: bitsPerElem = ⌈−ln(fpp)/ln²2⌉ (the
  *     standard optimal formula, 29 at the 1e-6 default) is computed
  *     ONCE in Scala and interpolated into the oracle SQL as a
  *     literal, so no transcendental function is ever evaluated on
  *     both engines; m rounds bitsPerElem·capacity up to a multiple
  *     of 64 with pure integer ops (SQL-mirrorable, unlike a
  *     next-power-of-two log2 round-trip).
  *
  * The fpp bound survives the rounding: k = round(bitsPerElem·ln 2)
  * probes against m ≥ bitsPerElem·n bits give
  * (1 − e^(−kn/m))^k ≤ (1 − e^(−20/29))^20 ≈ 8.7e-7 < 1e-6.
  */
object Md5Bloom {

  /** ⌈−ln(fpp)/ln²2⌉ — optimal bits per inserted element. */
  def bitsPerElem(fpp: Double): Int = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-math.log(fpp) / (math.log(2) * math.log(2))).toInt
  }

  /** round(bitsPerElem·ln 2) — optimal probe count (≥ 1). */
  def numHashes(fpp: Double): Int =
    math.max(1, math.round(bitsPerElem(fpp) * math.log(2)).toInt)

  /** Filter size in bits: bitsPerElem·capacity rounded UP to a
    * multiple of 64 — integer-exact, so the oracle's
    * `((bpe*n + 63) // 64) * 64` lands on the identical m. */
  def mBits(capacity: Long, fpp: Double): Long = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    ((bitsPerElem(fpp).toLong * capacity + 63L) / 64L) * 64L
  }

  /** (h1, h2) = little-endian u64 of MD5 digest bytes (8..15, 0..7) —
    * DuckDB's (md5_number_lower, md5_number_upper), bit-for-bit. */
  def hashPair(g: String): (Long, Long) = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def le64(off: Int): Long = {
      var h = 0L
      var j = 0
      while (j < 8) { h |= (dig(off + j) & 0xffL) << (8 * j); j += 1 }
      h
    }
    (le64(8), le64(0))
  }

  /** The k probe positions of `g` in an m-bit filter. */
  def positions(g: String, m: Long, k: Int): Array[Long] = {
    val (lo, hi) = hashPair(g)
    val h1 = java.lang.Long.remainderUnsigned(lo, m)
    val h2 = java.lang.Long.remainderUnsigned(hi, m)
    Array.tabulate(k)(i => (h1 + i.toLong * h2) % m)
  }
}
