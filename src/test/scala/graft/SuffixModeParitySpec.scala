package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.conf.DedupConfig
import graft.ingest.Ingest
import graft.testutil.FixtureGen

/** Winnow is a first-class suffix-index mode (round-5 VERDICT item 1):
  * grams and winnow must produce the IDENTICAL verified containment pair
  * set on the planted fixture corpus — the winnow guarantee (any shared
  * run ≥ minLen shares a selected fingerprint, SuffixArraySpec) makes the
  * recall identical, and the exact per-pair verifier rejects the extra
  * ≥k-token candidates winnow admits. Divergence is only possible at the
  * df-cap (documented caveat at the knob) — the fixture's boilerplate
  * headers exceed the cap under BOTH indexes by construction.
  */
class SuffixModeParitySpec extends AnyFunSuite with SparkTestBase {

  private def pairSet(cfg: DedupConfig): Set[(Long, Long)] = {
    val t1 = Ingest.ingest(
      spark.createDataFrame(FixtureGen.corpus(150, seed = 7L))
        .select("repo", "path", "commit", "lang", "content")
        .repartition(8))
    suffix.SuffixPass.containmentPairs(spark, DedupPipeline.distinctByContent(t1), cfg)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("grams and winnow modes verify the identical containment pair set") {
    val grams = pairSet(DedupConfig.default)
    val winnow = pairSet(DedupConfig.default.copy(suffixIndexMode = "winnow"))
    assert(grams.nonEmpty, "fixture planted no containment pairs — parity is vacuous")
    assert(winnow === grams,
      s"winnow diverged: only-grams=${(grams -- winnow).take(5)} only-winnow=${(winnow -- grams).take(5)}")
  }

  test("mode is a semantic knob: fingerprint changes only when non-default") {
    val base = DedupConfig.default
    assert(!base.fingerprint.contains("sfxmode"),
      "default fingerprint must stay byte-stable for existing lineage/state")
    val w = base.copy(suffixIndexMode = "winnow")
    assert(w.fingerprint.contains("sfxmode") && w.fingerprint != base.fingerprint)
    assert(w.winnowKEff == math.max(4, base.suffixMinLen / 2) &&
      w.winnowW + w.winnowKEff - 1 == base.suffixMinLen)
  }
}
