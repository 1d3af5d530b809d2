package graft.kernel

import java.util.SplittableRandom

import graft.Hashing
import graft.conf.DedupConfig

/** Pure-Scala tokenize → k-shingle → MinHash + SimHash kernel.
  *
  * This is the "batched MinHash signatures via typed Dataset mapPartitions
  * kernels" of the north star: one pass over a doc's shingles updates all
  * `numPerms` lanes; permutation coefficients are materialized once per
  * partition ([[PermCoefs]]), not per row. The same functions back the
  * single-threaded test oracle, so signature equality between pipeline and
  * oracle is bitwise (SURVEY.md §5.2).
  *
  * Pinned semantics (DefaultConfig v1, SURVEY.md §1.3):
  *  - token = maximal run of [A-Za-z0-9_], ASCII-lowercased; token hash =
  *    xxhash64(utf8 bytes, seed).
  *  - shingle = xxhash64-chain over k consecutive token hashes; docs with
  *    0 < tokens < k get one shingle over all tokens; 0 tokens → 0 shingles.
  *  - minhash lane i = min over shingles x of (a_i·fold61(x) + b_i) mod 2^61-1;
  *    empty docs → Long.MaxValue lanes (excluded from banding).
  *  - simhash = 64-bit sign vector of per-bit votes from distinct shingle
  *    hashes (Charikar STOC'02; unweighted votes, ties → 0 bit).
  */
object SignatureKernel {

  /** MinHash permutation coefficients. a_i, b_i drawn from
    * SplittableRandom(seed + i): a_i ∈ [1, p-1], b_i ∈ [0, p-1] (MMDS ch.3).
    * Build once per partition / per oracle run.
    */
  final class PermCoefs(val numPerms: Int, val seed: Long) extends Serializable {
    val a: Array[Long] = new Array[Long](numPerms)
    val b: Array[Long] = new Array[Long](numPerms)
    locally {
      var i = 0
      while (i < numPerms) {
        val r = new SplittableRandom(seed + i)
        a(i) = 1L + r.nextLong(Hashing.P61 - 1)
        b(i) = r.nextLong(Hashing.P61)
        i += 1
      }
    }
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Ordered token hashes (one xxhash64 per token, ASCII-lowercased bytes).
    * Single scan, no intermediate String per token.
    */
  def tokenHashes(content: String, seed: Long = Hashing.DefaultSeed): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    val buf = new Array[Byte](256)
    var bufLen = 0
    var i = 0
    val n = content.length
    var oversize: java.io.ByteArrayOutputStream = null
    while (i <= n) {
      val word = i < n && isWordChar(content.charAt(i))
      if (word) {
        val c = lowerAscii(content.charAt(i))
        if (oversize != null) oversize.write(c.toInt)
        else if (bufLen < buf.length) { buf(bufLen) = c.toByte; bufLen += 1 }
        else { // rare: token longer than 256 chars
          oversize = new java.io.ByteArrayOutputStream(512)
          oversize.write(buf, 0, bufLen)
          oversize.write(c.toInt)
        }
      } else if (bufLen > 0 || oversize != null) {
        val h =
          if (oversize != null) Hashing.xxBytes(oversize.toByteArray, seed)
          else graft.Hashing.xxBytes(java.util.Arrays.copyOf(buf, bufLen), seed)
        out += h
        bufLen = 0
        oversize = null
      }
      i += 1
    }
    out.toArray
  }

  /** Distinct, sorted shingle hashes from an ordered token-hash stream. */
  def shingles(tokens: Array[Long], k: Int, seed: Long = Hashing.DefaultSeed): Array[Long] = {
    val n = tokens.length
    if (n == 0) return Array.emptyLongArray
    val set = new java.util.TreeSet[java.lang.Long]()
    if (n < k) {
      set.add(Hashing.sparkXxhash64(n, tokens, 0, n))
    } else {
      var i = 0
      while (i + k <= n) {
        set.add(Hashing.sparkXxhash64(k, tokens, i, i + k))
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Batched MinHash: one pass over shingles updating all lanes. */
  def minhash(sh: Array[Long], coefs: PermCoefs): Array[Long] = {
    val p = coefs.numPerms
    val mins = new Array[Long](p)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val a = coefs.a
    val b = coefs.b
    var si = 0
    while (si < sh.length) {
      val x = Hashing.fold61(sh(si))
      var i = 0
      while (i < p) {
        val v = Hashing.mulAddMod61(a(i), x, b(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      si += 1
    }
    mins
  }

  /** 64-bit SimHash over distinct shingle hashes. */
  def simhash(sh: Array[Long]): Long = {
    if (sh.length == 0) return 0L
    val votes = new Array[Int](64)
    var si = 0
    while (si < sh.length) {
      val h = sh(si)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      si += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Full per-doc signature at config `cfg` with prebuilt coefficients. */
  def signature(docId: Long, content: String, cfg: DedupConfig, coefs: PermCoefs): graft.model.Signature = {
    val toks = tokenHashes(content, cfg.seed)
    val sh = shingles(toks, cfg.shingleK, cfg.seed)
    graft.model.Signature(docId, minhash(sh, coefs), simhash(sh), sh.length)
  }
}
