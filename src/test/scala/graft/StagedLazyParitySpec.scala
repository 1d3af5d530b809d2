package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig
import graft.ingest.Ingest
import graft.io.ParquetCatalog
import graft.model.CorpusRow

/** The staged CLI ([[Dedup]]) and the lazy pipeline ([[DedupPipeline]]) must
  * produce identical verified pairs and clusters — including on the case
  * that broke round 1: a pair emitted by BOTH the suffix pass and an LSH
  * band, where the LSH est/hamming check fails. The staged path used to
  * collapse sources with alphabetical min("src") before verification
  * ('minhash' < 'suffix'), routing such containment pairs through the LSH
  * check and silently dropping them.
  *
  * The trigger corpus forces the overlap deterministically: B contains A
  * verbatim (suffix pair by construction) with enough junk appended that
  * Jaccard ≈ 0.33 ≪ τ, under a wide banding config (64 bands × 2 rows,
  * collision threshold ≈ 0.125) so the pair also collides in some band.
  */
class StagedLazyParitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // same perm budget as v1 (numPerms = bands*rowsPerBand = 128)
  private val cfg = DedupConfig(bands = 64, rowsPerBand = 2)

  private lazy val corpus: Seq[CorpusRow] = {
    val aToks = (0 until 100).map(i => s"alpha$i")
    val bToks = aToks ++ (0 until 200).map(i => s"junk$i")
    val fillers = (0 until 20).map { d =>
      CorpusRow("r2", s"f$d.txt", "c1", "scala",
        (0 until 80).map(i => s"fill${d}_$i").mkString(" "))
    }
    Seq(
      CorpusRow("r1", "a.txt", "c1", "scala", aToks.mkString(" ")),
      CorpusRow("r1", "b.txt", "c1", "scala", bToks.mkString(" "))) ++ fillers
  }

  private lazy val idA = testutil.ReferenceOracle.docId(corpus(0))
  private lazy val idB = testutil.ReferenceOracle.docId(corpus(1))
  private lazy val pairAB = (math.min(idA, idB), math.max(idA, idB))

  private lazy val t1 = Ingest.ingest(
    spark.createDataFrame(corpus).select("repo", "path", "commit", "lang", "content"))
    .repartition(4)

  private lazy val lazyRes = DedupPipeline.run(spark, t1, cfg)

  test("trigger sanity: (A,B) is an LSH candidate AND fails the LSH verify rule") {
    val sigs = lazyRes.signatures
      .select("doc_id", "minhash", "simhash").as[(Long, Array[Long], Long)]
      .collect().map(s => s._1 -> (s._2, s._3)).toMap
    val (mhA, shA) = sigs(idA)
    val (mhB, shB) = sigs(idB)
    val est = mhA.zip(mhB).count(t => t._1 == t._2).toDouble / cfg.numPerms
    val ham = java.lang.Long.bitCount(shA ^ shB)
    assert(est < cfg.jaccardTau, s"est=$est must fail the Jaccard check for the trigger")
    assert(ham > cfg.hammingMax, s"hamming=$ham must fail the Hamming check for the trigger")
    // and they DO share at least one band (the overlap condition)
    val (lshPairs, _) = lsh.CandidatePairs.generateJoin(
      spark, lsh.Banding.bandRows(lazyRes.signatures, cfg), cfg)
    val lshSet = lshPairs.select("a", "b").as[(Long, Long)].collect().toSet
    assert(lshSet.contains(pairAB), "trigger pair must collide in some LSH band")
  }

  test("staged verified pairs/clusters equal the lazy pipeline's, overlap pair kept as suffix") {
    val dir = Files.createTempDirectory("graft-parity").toString
    Dedup.run(spark, spark.createDataFrame(corpus)
      .select("repo", "path", "commit", "lang", "content"), dir, cfg, inputId = "parity")
    val cat = new ParquetCatalog(dir)

    val stagedVerified = cat.read(spark, "verified_pairs")
      .select("a", "b", "src").as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lazyVerified = lazyRes.verifiedPairs
      .select("a", "b", "src").as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(stagedVerified === lazyVerified)

    // the containment pair survived with by-construction source
    assert(stagedVerified.get(pairAB) === Some("suffix"))

    val stagedClusters = cat.read(spark, "clusters").as[(Long, Long)].collect().toMap
    val lazyClusters = lazyRes.clusters.as[(Long, Long)].collect().toMap
    assert(stagedClusters === lazyClusters)
    // A and B are clustered together despite failing the LSH verify rule
    assert(stagedClusters(idA) === stagedClusters(idB))
  }
}
