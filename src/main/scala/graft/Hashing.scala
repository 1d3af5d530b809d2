package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Deterministic hashing shared by the Spark pipeline, the typed kernels and
  * the test oracle. Everything here is pure JVM arithmetic — bitwise
  * reproducible across partitions, JVMs and runs (SURVEY.md §7.4 item 2).
  *
  * `xxLong`/`xxBytes` delegate to Spark's own XXH64 so kernel-side hashes are
  * exactly the values the built-in `xxhash64(...)` Column expression produces
  * (seed chaining replicated in [[sparkXxhash64]]), letting DataFrame stages
  * and mapPartitions kernels interoperate on the same hash space.
  */
object Hashing {

  /** Mersenne prime 2^61 - 1, the modulus of the MinHash permutation family
    * h_i(x) = (a_i*x + b_i) mod p (MMDS ch.3).
    */
  val P61: Long = (1L << 61) - 1

  val DefaultSeed: Long = 42L

  @inline def xxLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)

  @inline def xxInt(v: Int, seed: Long): Long = XXH64.hashInt(v, seed)

  def xxBytes(b: Array[Byte], seed: Long): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)

  def xxString(s: String, seed: Long): Long =
    xxBytes(s.getBytes(StandardCharsets.UTF_8), seed)

  /** Fold an arbitrary 64-bit value into [0, 2^61-1). */
  @inline def fold61(x: Long): Long = {
    var v = (x & P61) + (x >>> 61)
    if (v >= P61) v -= P61
    v
  }

  /** (a*x + b) mod (2^61-1) without overflow, for 0 <= a,x,b < 2^61-1.
    * Uses the Mersenne identity 2^61 ≡ 1: split the 128-bit product
    * (hi·2^64 + lo) as hi·2^3·2^61 + lo ≡ hi·8 + (lo mod 2^61) + (lo >> 61).
    */
  @inline def mulAddMod61(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // a,x < 2^61 so the signed product is exact
    val lo = a * x
    val t = (lo & P61) + (lo >>> 61) + (hi << 3) // < 2^62: fold once more
    var r = (t & P61) + (t >>> 61) + b
    while (r >= P61) r -= P61
    r
  }

  /** Replicates Spark's `xxhash64(intCol, arrayOfLongCol)` seed chaining
    * (HashExpression folds each input, and each array element, through the
    * accumulated hash) so band hashes computed in a DataFrame expression and
    * in the oracle agree bit-for-bit. Verified against the real expression in
    * HashingSpec.
    */
  def sparkXxhash64(bandIdx: Int, lanes: Array[Long], from: Int, until: Int): Long = {
    var h = XXH64.hashInt(bandIdx, DefaultSeed)
    var i = from
    while (i < until) {
      h = XXH64.hashLong(lanes(i), h)
      i += 1
    }
    h
  }
}
