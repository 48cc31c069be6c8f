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
    val bpe = bitsPerElem(fpp).toLong
    // bpe*capacity must not wrap, and the resulting m must satisfy the
    // positions() no-overflow precondition m < Long.MaxValue / k — past
    // that, i*h2 wraps negative and the probe would silently treat
    // negative positions as unset bits, voiding the no-false-negative
    // guarantee. Fail loudly instead (capacity ≳ 1.6e16 at defaults —
    // absurd for a single filter; shard the keyspace first).
    require(capacity <= (Long.MaxValue - 63L) / bpe,
      s"bitsPerElem($bpe) * capacity($capacity) overflows Long")
    val m = ((bpe * capacity + 63L) / 64L) * 64L
    requireNoOverflow(m, numHashes(fpp))
    m
  }

  /** The double-hashing no-overflow precondition for [[positions]]:
    * every intermediate (h1 + i*h2) with h1,h2 < m and i < k stays
    * below k*m, which must not wrap a signed Long. */
  private def requireNoOverflow(m: Long, k: Int): Unit = {
    require(m > 0 && k >= 1, s"need m > 0 and k >= 1, got m=$m k=$k")
    require(m < Long.MaxValue / k,
      s"m=$m violates m < Long.MaxValue/k (k=$k): i*h2 would wrap " +
        "negative and probes would silently miss set bits")
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
    requireNoOverflow(m, k)
    val (lo, hi) = hashPair(g)
    val h1 = java.lang.Long.remainderUnsigned(lo, m)
    val h2 = java.lang.Long.remainderUnsigned(hi, m)
    Array.tabulate(k)(i => (h1 + i.toLong * h2) % m)
  }
}
