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
