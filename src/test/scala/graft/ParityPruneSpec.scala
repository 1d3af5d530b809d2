package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig
import graft.kernel.SignatureKernel
import graft.model.Signature

/** The Verifier's slim lane-parity prefilter is an EXACT upper-bound prune,
  * not an approximation: its output (pairs AND est values) must equal the
  * unpruned rule computed independently. Exercised over every pair of a
  * random corpus mixing planted near-dups (est spanning τ) with unrelated
  * docs (the population the prune exists to shed).
  */
class ParityPruneSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val cfg = DedupConfig.default

  test("two-phase verify ≡ unpruned est/hamming rule on all-pairs of a mixed corpus") {
    val rnd = new java.util.SplittableRandom(4242)
    val coefs = new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed)

    // 40 docs: 10 near-dup pairs at varying overlap + 20 unrelated
    val shingleSets: Seq[Array[Long]] = {
      val planted = (0 until 10).flatMap { g =>
        val n = 100 + rnd.nextInt(200)
        val base = Array.fill(n)(rnd.nextLong())
        val keep = (n * (0.55 + 0.05 * g)).toInt // overlap spans τ
        val variant = base.take(keep) ++ Array.fill(n - keep)(rnd.nextLong())
        Seq(base, variant)
      }
      val unrelated = (0 until 20).map(_ => Array.fill(80 + rnd.nextInt(200))(rnd.nextLong()))
      (planted ++ unrelated).map(_.distinct.sorted)
    }
    val sigsLocal = shingleSets.zipWithIndex.map { case (sh, i) =>
      Signature(i.toLong, SignatureKernel.minhash(sh, coefs), SignatureKernel.simhash(sh), sh.length)
    }

    val ids = sigsLocal.map(_.doc_id)
    val allPairs = for { a <- ids; b <- ids if a < b } yield (a, b, "minhash")

    val sigsDf = spark.createDataFrame(sigsLocal)
    val pairsDf = allPairs.toDF("a", "b", "src")
    val got = verify.Verifier.verifyLshPairs(pairsDf, sigsDf, cfg)
      .select("a", "b", "est_jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    // independent unpruned rule
    val byId = sigsLocal.map(s => s.doc_id -> s).toMap
    val expected = allPairs.flatMap { case (a, b, _) =>
      val (sa, sb) = (byId(a), byId(b))
      val eq = sa.minhash.zip(sb.minhash).count(t => t._1 == t._2)
      val est = eq.toDouble / cfg.numPerms
      val ham = java.lang.Long.bitCount(sa.simhash ^ sb.simhash)
      if (est >= cfg.jaccardTau || ham <= cfg.hammingMax) Some((a, b) -> est) else None
    }.toMap

    assert(got.keySet === expected.keySet,
      s"extra=${(got.keySet -- expected.keySet).take(5)} missing=${(expected.keySet -- got.keySet).take(5)}")
    expected.foreach { case (k, est) => assert(got(k) === est, s"est mismatch for $k") }
    // sanity: the corpus actually exercises both sides of τ
    assert(expected.nonEmpty && expected.size < allPairs.size)
  }

  test("parity upper bound is sound: equal lanes ≤ numPerms − popcount(parity xor)") {
    val rnd = new java.util.SplittableRandom(7)
    val coefs = new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed)
    for (_ <- 1 to 200) {
      val n = 50 + rnd.nextInt(200)
      val a = Array.fill(n)(rnd.nextLong()).distinct.sorted
      val keep = rnd.nextInt(n)
      val b = (a.take(keep) ++ Array.fill(n - keep)(rnd.nextLong())).distinct.sorted
      val (ma, mb) = (SignatureKernel.minhash(a, coefs), SignatureKernel.minhash(b, coefs))
      val eq = ma.zip(mb).count(t => t._1 == t._2)
      def parity(m: Array[Long], w: Int): Long =
        m.slice(w * 64, w * 64 + 64).foldLeft(0L)((acc, x) => (acc << 1) | (x & 1L))
      val d = (0 until cfg.numPerms / 64)
        .map(w => java.lang.Long.bitCount(parity(ma, w) ^ parity(mb, w))).sum
      assert(eq <= cfg.numPerms - d, s"bound violated: eq=$eq diff=$d")
    }
  }
}
