package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.conf.DedupConfig
import graft.kernel.SignatureKernel

/** Statistical/algebraic properties (SURVEY.md §5.2 item 4). ScalaCheck is
  * used generator-only (no scalatestplus bridge in the offline cache):
  * 100 deterministic samples per property.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val cfg = DedupConfig.default
  private lazy val coefs = new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed)

  test("estimated Jaccard is within the Hoeffding bound of exact Jaccard (w.h.p.)") {
    // 128 perms, delta=1e-6 per trial: eps = sqrt(ln(2/delta)/(2*128)) ≈ 0.238.
    // Run 60 deterministic trials across the similarity range; a single
    // violation of the bound fails (prob < 6e-5 overall if correct).
    val eps = math.sqrt(math.log(2 / 1e-6) / (2.0 * cfg.numPerms))
    val rnd = new java.util.SplittableRandom(101)
    for (trial <- 1 to 60) {
      val nShared = 20 + rnd.nextInt(400)
      val nA = rnd.nextInt(300)
      val nB = rnd.nextInt(300)
      val shared = Array.fill(nShared)(rnd.nextLong())
      val a = (shared ++ Array.fill(nA)(rnd.nextLong())).distinct.sorted
      val b = (shared ++ Array.fill(nB)(rnd.nextLong())).distinct.sorted
      val exact = a.intersect(b).length.toDouble / a.union(b).distinct.length
      val ma = SignatureKernel.minhash(a, coefs)
      val mb = SignatureKernel.minhash(b, coefs)
      val est = ma.zip(mb).count { case (x, y) => x == y }.toDouble / cfg.numPerms
      assert(math.abs(est - exact) <= eps,
        s"trial $trial: est=$est exact=$exact |diff|>${eps}")
    }
  }

  test("pair canonicalization is total: a < b for every emitted pair") {
    samples(Gen.listOfN(40, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))).foreach { ids =>
      val pairs = for {
        x <- ids; y <- ids if x != y
      } yield (math.min(x, y), math.max(x, y))
      assert(pairs.forall { case (a, b) => a < b })
    }
  }

  test("tokenizer is idempotent under re-rendering with arbitrary separators") {
    val seps = Seq(" ", "\n", "\t", " ;; ", "()[]", " = ")
    samples(Gen.listOfN(30, Gen.alphaNumStr.suchThat(_.nonEmpty)), 50).foreach { words =>
      val rnd = new java.util.SplittableRandom(words.hashCode.toLong)
      val t1 = SignatureKernel.tokenHashes(words.mkString(" "))
      val t2 = SignatureKernel.tokenHashes(
        words.map(w => w + seps(rnd.nextInt(seps.size))).mkString)
      assert(t1.toSeq === t2.toSeq)
    }
  }

  test("simhash Hamming distance grows monotonically-ish with edit fraction") {
    val rnd = new java.util.SplittableRandom(7)
    val base = Array.fill(600)(rnd.nextLong())
    val s0 = SignatureKernel.simhash(base)
    val dists = Seq(0.02, 0.10, 0.40, 0.90).map { f =>
      val mutated = base.clone()
      var i = 0
      while (i < (base.length * f).toInt) { mutated(i) = rnd.nextLong(); i += 1 }
      java.lang.Long.bitCount(s0 ^ SignatureKernel.simhash(mutated))
    }
    assert(dists.head <= 4, s"2% edits moved simhash too far: $dists")
    assert(dists.last >= 16, s"90% edits kept simhash too close: $dists")
    assert(dists.head <= dists.last)
  }
}
