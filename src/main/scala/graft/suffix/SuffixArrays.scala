package graft.suffix

/** Suffix-array utilities for the containment pass (SURVEY.md §2 row 21;
  * Lee et al. ACL'22 style substring dedup, scoped per candidate pair so the
  * kernel is bounded — a corpus-global suffix array is not distributable on
  * Spark, see SuffixPass scaladoc).
  *
  * Works on token-hash sequences (Array[Long]) mapped into rank space.
  * Prefix-doubling construction, O(n log² n); Kasai LCP.
  */
object SuffixArrays {

  /** EXACT decision "do `a` and `b` share a substring of ≥ L tokens?", in
    * O(|a|+|b|) expected time: rolling-hash every L-gram of `a` into a
    * position map, roll over `b`, and on a hash hit compare the TOKENS
    * directly — a confirmed window is an exact witness (then greedily
    * extended for a longer reported run); a mismatched hit is a hash
    * collision. Only when every hit collides and none confirms does the
    * O(n log² n) [[maxCommonSubstring]] run as the fallback arbiter
    * (a true common window's hash is always present in the map, so
    * "no hit at all" is an exact rejection — the same determinism argument
    * as SuffixPass.grams).
    *
    * Returns a witness common-run length (≥ L, not necessarily the global
    * maximum) or 0 when no common substring of length ≥ L exists. This is
    * the verification hot path: the per-pair SA build is ~10 ms on
    * multi-thousand-token docs and dominated the content-weighted e2e
    * (measured: 540 s of a 677 s run, every worker inside build()); the
    * boolean the pipeline needs is decidable without it.
    */
  def commonRunAtLeast(a: Array[Long], b: Array[Long], L: Int): Int = {
    if (L <= 0) return 0
    if (a.length < L || b.length < L) return 0
    val nA = a.length - L + 1
    val nB = b.length - L + 1
    val B = 0x9E3779B97F4A7C15L // same family as SuffixPass.grams
    var bl = 1L
    var i = 0
    while (i < L - 1) { bl *= B; i += 1 }
    val map = new java.util.HashMap[java.lang.Long, java.lang.Integer](nA * 2)
    var h = 0L
    i = 0
    while (i < L) { h = h * B + a(i); i += 1 }
    map.putIfAbsent(h, 0)
    i = 1
    while (i < nA) {
      h = (h - a(i - 1) * bl) * B + a(i + L - 1)
      map.putIfAbsent(h, i)
      i += 1
    }
    var collision = false
    h = 0L
    i = 0
    while (i < L) { h = h * B + b(i); i += 1 }
    var j = 0
    while (j < nB) {
      if (j > 0) h = (h - b(j - 1) * bl) * B + b(j + L - 1)
      val p = map.get(h)
      if (p != null) {
        val pa = p.intValue()
        var k = 0
        while (k < L && a(pa + k) == b(j + k)) k += 1
        if (k == L) {
          // exact witness — extend greedily to report a maximal run
          // around this window (informational; callers gate on ≥ L)
          var lo = 0
          while (pa - lo > 0 && j - lo > 0 && a(pa - lo - 1) == b(j - lo - 1)) lo += 1
          var hi = 0
          while (pa + L + hi < a.length && j + L + hi < b.length &&
            a(pa + L + hi) == b(j + L + hi)) hi += 1
          return L + lo + hi
        } else collision = true
      }
      j += 1
    }
    if (collision) {
      // all hash hits were collisions; the slow exact arbiter decides
      val m = maxCommonSubstring(a, b)
      if (m >= L) m else 0
    } else 0
  }

  /** Length (in tokens) of the longest substring shared between `a` and `b`. */
  def maxCommonSubstring(a: Array[Long], b: Array[Long]): Int = {
    val na = a.length
    val nb = b.length
    if (na == 0 || nb == 0) return 0
    val n = na + 1 + nb

    // Rank-compress values; sentinel separator gets the unique smallest rank.
    val all = new Array[Long](na + nb)
    System.arraycopy(a, 0, all, 0, na)
    System.arraycopy(b, 0, all, na, nb)
    val sortedVals = all.clone()
    java.util.Arrays.sort(sortedVals)
    def rankOf(v: Long): Int = java.util.Arrays.binarySearch(sortedVals, v) + 2
    val s = new Array[Int](n)
    var i = 0
    while (i < na) { s(i) = rankOf(a(i)); i += 1 }
    s(na) = 1 // sentinel
    i = 0
    while (i < nb) { s(na + 1 + i) = rankOf(b(i)); i += 1 }

    val sa = build(s)
    val lcp = kasai(s, sa)

    // Max cross-string LCP. LCP(sa(i), sa(j)) = min(lcp(i+1..j)), so for
    // each suffix the best partner from the other string is the *nearest*
    // one in SA order — scan once keeping the running min-LCP since the
    // last A-suffix and since the last B-suffix.
    var best = 0
    var minA = -1 // min LCP between the last a-suffix and the current entry; -1 = none seen
    var minB = -1
    i = 0
    while (i < n) {
      if (i > 0) {
        val l = lcp(i)
        if (minA >= 0 && l < minA) minA = l
        if (minB >= 0 && l < minB) minB = l
      }
      val pos = sa(i)
      if (pos < na) {
        if (minB > best) best = minB
        minA = Int.MaxValue // becomes lcp(i+1) at the next step
      } else if (pos > na) {
        if (minA > best) best = minA
        minB = Int.MaxValue
      }
      i += 1
    }
    best
  }

  /** Prefix-doubling suffix array over positive int ranks (0 not used). */
  private def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    val sa = Array.tabulate(n)(identity)
    var rank = s.map(_.toLong)
    var tmp = new Array[Long](n)
    var k = 1
    val boxed = sa.map(Integer.valueOf)
    while (k < n) {
      val kk = k
      val cmp = new java.util.Comparator[Integer] {
        def compare(x: Integer, y: Integer): Int = {
          val i = x.intValue(); val j = y.intValue()
          if (rank(i) != rank(j)) java.lang.Long.compare(rank(i), rank(j))
          else {
            val ri = if (i + kk < n) rank(i + kk) else -1L
            val rj = if (j + kk < n) rank(j + kk) else -1L
            java.lang.Long.compare(ri, rj)
          }
        }
      }
      java.util.Arrays.sort(boxed, cmp)
      var i = 0
      while (i < n) { sa(i) = boxed(i).intValue(); i += 1 }
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (cmp.compare(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      val t = rank; rank = tmp.clone(); tmp = t
      if (rank(sa(n - 1)) == n - 1) k = n // all distinct: done
      else k <<= 1
    }
    sa
  }

  /** Kasai et al. LCP array: lcp(i) = LCP(suffix sa(i-1), suffix sa(i)). */
  private def kasai(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }
}
