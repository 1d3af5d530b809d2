package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.conf.DedupConfig
import graft.kernel.SignatureKernel

class KernelSpec extends AnyFunSuite {
  private val cfg = DedupConfig.default

  test("tokenizer: ASCII word chars, lowercased, punctuation stripped") {
    val t1 = SignatureKernel.tokenHashes("Foo bar_Baz  123;\n(qux)=");
    val t2 = SignatureKernel.tokenHashes("foo\tbar_baz 123 qux")
    assert(t1.toSeq === t2.toSeq)
    assert(t1.length === 4)
  }

  test("tokenizer handles empty / punctuation-only / long tokens") {
    assert(SignatureKernel.tokenHashes("").isEmpty)
    assert(SignatureKernel.tokenHashes("!!! ---").isEmpty)
    val long = "a" * 1000
    val t = SignatureKernel.tokenHashes(s"$long b")
    assert(t.length === 2)
    assert(t(0) === Hashing.xxString(long, Hashing.DefaultSeed))
  }

  test("shingles: n tokens -> <= n-k+1 distinct sorted hashes; short docs one shingle") {
    val toks = Array.tabulate(20)(i => Hashing.xxLong(i, 1))
    val sh = SignatureKernel.shingles(toks, 5)
    assert(sh.length === 16)
    assert(sh.toSeq === sh.sorted.toSeq)
    assert(SignatureKernel.shingles(toks.take(3), 5).length === 1)
    assert(SignatureKernel.shingles(Array.emptyLongArray, 5).isEmpty)
  }

  test("minhash: deterministic, bounded by P61, empty -> MaxValue sentinel") {
    val coefs = new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed)
    val sh = SignatureKernel.shingles(Array.tabulate(50)(i => Hashing.xxLong(i, 2)), 5)
    val m1 = SignatureKernel.minhash(sh, coefs)
    val m2 = SignatureKernel.minhash(sh, new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed))
    assert(m1.toSeq === m2.toSeq)
    assert(m1.forall(v => v >= 0 && v < Hashing.P61))
    assert(SignatureKernel.minhash(Array.emptyLongArray, coefs).forall(_ == Long.MaxValue))
  }

  test("minhash similarity tracks Jaccard") {
    val coefs = new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed)
    val rnd = new java.util.SplittableRandom(3)
    val base = Array.fill(400)(rnd.nextLong())
    val a = base.take(300) // |A ∩ B| = 200, |A ∪ B| = 400 -> J = 0.5
    val b = base.drop(100)
    val ma = SignatureKernel.minhash(a.sorted.distinct, coefs)
    val mb = SignatureKernel.minhash(b.sorted.distinct, coefs)
    val eq = ma.zip(mb).count { case (x, y) => x == y }.toDouble / cfg.numPerms
    assert(eq > 0.35 && eq < 0.65, s"est=$eq expected ~0.5")
  }

  test("simhash: identical sets equal; near sets within small Hamming distance") {
    val rnd = new java.util.SplittableRandom(5)
    val base = Array.fill(500)(rnd.nextLong())
    val s1 = SignatureKernel.simhash(base)
    val s2 = SignatureKernel.simhash(base.clone())
    assert(s1 === s2)
    val tweaked = base.clone(); tweaked(0) = rnd.nextLong(); tweaked(1) = rnd.nextLong()
    val s3 = SignatureKernel.simhash(tweaked)
    assert(java.lang.Long.bitCount(s1 ^ s3) <= 8)
  }
}
