package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.conf.DedupConfig
import graft.ingest.Ingest
import graft.model.CorpusRow
import graft.testutil.ReferenceOracle

/** Stop-band capping (SURVEY.md §2 row 19 / §4.2 item 2): band groups
  * larger than stopBandSize are dropped and logged, and the oracle applies
  * the identical rule — so pipeline ≡ oracle even when capping bites.
  */
class StopBandSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // 60 near-identical docs (shared 80-token body + 1 unique token) plus
  // unrelated filler: every band group for the family has ~60 members.
  private def corpus: Vector[CorpusRow] = {
    val rnd = new java.util.SplittableRandom(77)
    val body = Array.fill(80)(f"tok${rnd.nextInt(500)}%03d").mkString(" ")
    val fam = (0 until 60).map { i =>
      CorpusRow(f"repo$i%03d", s"src/f$i.scala", f"c$i%08x", "scala", s"$body uniq$i")
    }
    val filler = (0 until 40).map { i =>
      CorpusRow("repoX", s"src/u$i.scala", f"d$i%08x", "scala",
        Array.fill(60)(f"tok${rnd.nextInt(500)}%03d w$i").mkString(" "))
    }
    (fam ++ filler).toVector
  }

  test("bands over stopBandSize are dropped, logged, and oracle-identical") {
    val cfg = DedupConfig(stopBandSize = 30, maxBandSize = 20)
    val t1 = Ingest.ingest(spark.createDataFrame(corpus)
      .select("repo", "path", "commit", "lang", "content"))
    val res = DedupPipeline.run(spark, t1, cfg) // suffix ON: oracle always includes it

    val stop = res.stopBands.collect()
    assert(stop.nonEmpty, "expected hot bands above stopBandSize=30")
    assert(stop.forall(_.getLong(2) > 30))

    val got = res.candidatePairs.select("a", "b").as[(Long, Long)].collect().toSet
    val oracle = ReferenceOracle.run(corpus, cfg)
    assert(got === oracle.candidatePairs,
      s"extra=${(got -- oracle.candidatePairs).take(3)} missing=${(oracle.candidatePairs -- got).take(3)}")
    assert(res.clusters.as[(Long, Long)].collect().toMap === oracle.clusters)
  }

  test("same corpus without capping produces the quadratic family pairs") {
    val cfg = DedupConfig(stopBandSize = 20000)
    val t1 = Ingest.ingest(spark.createDataFrame(corpus)
      .select("repo", "path", "commit", "lang", "content"))
    val res = DedupPipeline.run(spark, t1, cfg)
    val n = res.verifiedPairs.count()
    assert(n >= 60L * 59 / 2, s"expected the full family clique, got $n pairs")
    assert(res.candidatePairs.select("a", "b").as[(Long, Long)].collect().toSet ===
      ReferenceOracle.run(corpus, cfg).candidatePairs)
  }
}
