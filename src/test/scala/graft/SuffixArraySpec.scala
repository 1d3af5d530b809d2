package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.suffix.SuffixArrays

class SuffixArraySpec extends AnyFunSuite {

  /** Naive O(n·m) DP longest common substring, the independent check. */
  private def naive(a: Array[Long], b: Array[Long]): Int = {
    var best = 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    }
    best
  }

  test("matches naive DP on random small-alphabet arrays") {
    val rnd = new java.util.SplittableRandom(17)
    for (trial <- 1 to 200) {
      val na = 1 + rnd.nextInt(80)
      val nb = 1 + rnd.nextInt(80)
      val alpha = 2 + rnd.nextInt(6)
      val a = Array.fill(na)(rnd.nextInt(alpha).toLong)
      val b = Array.fill(nb)(rnd.nextInt(alpha).toLong)
      assert(SuffixArrays.maxCommonSubstring(a, b) === naive(a, b), s"trial $trial")
    }
  }

  test("planted shared run is found exactly") {
    val rnd = new java.util.SplittableRandom(19)
    val run = Array.fill(60)(rnd.nextLong())
    val a = Array.fill(100)(rnd.nextLong()) ++ run ++ Array.fill(50)(rnd.nextLong())
    val b = Array.fill(30)(rnd.nextLong()) ++ run ++ Array.fill(200)(rnd.nextLong())
    assert(SuffixArrays.maxCommonSubstring(a, b) === 60)
  }

  test("edge cases: empty, identical, disjoint") {
    assert(SuffixArrays.maxCommonSubstring(Array.emptyLongArray, Array(1L)) === 0)
    val x = Array.tabulate(40)(_.toLong)
    assert(SuffixArrays.maxCommonSubstring(x, x) === 40)
    assert(SuffixArrays.maxCommonSubstring(Array(1L, 2L), Array(3L, 4L)) === 0)
  }

  test("commonRunAtLeast: decision agrees with maxCommonSubstring; witness bounded") {
    val rnd = new java.util.SplittableRandom(29)
    for (trial <- 1 to 300) {
      val na = 1 + rnd.nextInt(120)
      val nb = 1 + rnd.nextInt(120)
      val alpha = 2 + rnd.nextInt(5) // small alphabet → many borderline runs
      val a = Array.fill(na)(rnd.nextInt(alpha).toLong)
      val b = Array.fill(nb)(rnd.nextInt(alpha).toLong)
      val l = 1 + rnd.nextInt(12)
      val mcs = SuffixArrays.maxCommonSubstring(a, b)
      val w = SuffixArrays.commonRunAtLeast(a, b, l)
      assert((w >= l) === (mcs >= l), s"trial $trial L=$l mcs=$mcs w=$w")
      if (w > 0) assert(w >= l && w <= mcs, s"trial $trial witness out of bounds")
    }
    // planted long-run case at the real minLen
    val run = Array.fill(70)(rnd.nextLong())
    val a = Array.fill(500)(rnd.nextLong()) ++ run ++ Array.fill(300)(rnd.nextLong())
    val b = Array.fill(100)(rnd.nextLong()) ++ run ++ Array.fill(700)(rnd.nextLong())
    val w = SuffixArrays.commonRunAtLeast(a, b, 50)
    assert(w === 70, s"witness should extend to the full planted run, got $w")
    assert(SuffixArrays.commonRunAtLeast(a.take(400), b.take(90), 50) === 0)
  }

  test("winnow guarantee: shared run >= minLen shares a fingerprint") {
    import graft.suffix.SuffixPass
    val cfg = conf.DedupConfig.default
    // winnowing with k-gram k and window w detects shared runs >= w+k-1
    val k = math.max(4, cfg.suffixMinLen / 2); val w = cfg.suffixMinLen - k + 1
    val rnd = new java.util.SplittableRandom(23)
    for (_ <- 1 to 50) {
      val run = Array.fill(cfg.suffixMinLen)(rnd.nextLong())
      val a = Array.fill(rnd.nextInt(300))(rnd.nextLong()) ++ run ++ Array.fill(rnd.nextInt(300))(rnd.nextLong())
      val b = Array.fill(rnd.nextInt(300))(rnd.nextLong()) ++ run ++ Array.fill(rnd.nextInt(300))(rnd.nextLong())
      val fa = SuffixPass.winnow(a, k, w).toSet
      val fb = SuffixPass.winnow(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty)
    }
  }
}
