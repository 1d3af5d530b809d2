package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.conf.DedupConfig
import graft.ingest.Ingest
import graft.testutil.{FixtureGen, ReferenceOracle}

/** The correctness gate (SURVEY.md §5.2): run the Spark pipeline and the
  * single-threaded oracle on the same planted-duplicate corpus at the same
  * pinned config and demand:
  *   (a) bitwise signature equality,
  *   (b) sha256 per-row invariant,
  *   (c) dup-pair recall >= 0.99 (expected: exact set equality),
  *   (d) cluster partition equality,
  *   (e) planted exact/near/contained families actually clustered.
  */
class EndToEndSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // default 2000 keeps `sbt test` fast; the FIXTURES.md 5000-doc scale is
  // exercised via GRAFT_E2E_DOCS=5000 (run at least once per round)
  private val nDocs = sys.env.getOrElse("GRAFT_E2E_DOCS", "2000").toInt
  // maxBandSize lowered so fixture band groups (exact-dup groups of up to 20
  // identical signatures) genuinely exercise salting; pair/cluster output is
  // provably independent of maxBandSize (SaltingSpec).
  private val cfg = DedupConfig(maxBandSize = 15)

  private lazy val (corpus, labels) = FixtureGen.corpusWithLabels(nDocs, 42L)
  private lazy val oracle = ReferenceOracle.run(corpus, cfg)
  private lazy val t1: DataFrame = {
    val df = spark.createDataFrame(corpus)
    Ingest.ingest(df.select("repo", "path", "commit", "lang", "content"))
      .repartition(7) // deliberately ugly partitioning: results must not care
  }
  private lazy val result = DedupPipeline.run(spark, t1, cfg)

  test("doc ids and sha256 match the oracle per row (invariant)") {
    val got = result.t1.select("doc_id", "content_sha256").as[(Long, String)].collect().toMap
    assert(got.size === nDocs)
    assert(got === oracle.sha256)
  }

  test("signatures are bitwise equal to the oracle (sha-distinct reps)") {
    val got = result.signatures.select("doc_id", "minhash", "simhash", "n_shingles")
      .as[(Long, Array[Long], Long, Int)].collect()
    val nReps = oracle.sha256.values.toSet.size
    assert(got.length === nReps)
    got.foreach { case (id, mh, sh, n) =>
      val o = oracle.signatures(id)
      assert(n === o.n_shingles, s"n_shingles doc $id")
      assert(sh === o.simhash, s"simhash doc $id")
      assert(mh.toSeq === o.minhash.toSeq, s"minhash doc $id")
    }
  }

  test("candidate pairs equal the oracle's (recall >= 0.99 required, exact expected)") {
    val got = result.candidatePairs.select("a", "b").as[(Long, Long)].collect().toSet
    val golden = oracle.candidatePairs
    val recall = got.intersect(golden).size.toDouble / math.max(1, golden.size)
    assert(recall >= 0.99, s"candidate recall $recall")
    assert(got === golden, s"extra=${(got -- golden).take(5)} missing=${(golden -- got).take(5)}")
  }

  test("verified pairs equal the oracle's") {
    val got = result.verifiedPairs.select("a", "b").as[(Long, Long)].collect().toSet
    val golden = oracle.verifiedPairs
    val recall = got.intersect(golden).size.toDouble / math.max(1, golden.size)
    assert(recall >= 0.99, s"verified recall $recall")
    assert(got === golden, s"extra=${(got -- golden).take(5)} missing=${(golden -- got).take(5)}")
  }

  test("cluster assignments equal the oracle's partition") {
    val got = result.clusters.as[(Long, Long)].collect().toMap
    assert(got.size === nDocs)
    assert(got === oracle.clusters)
  }

  test("planted families are actually clustered (sanity vs ground truth)") {
    val ids = corpus.map(ReferenceOracle.docId)
    val byGroup = ids.zip(labels).groupBy { case (_, l) => (l.family, l.groupId) }
    val clusters = oracle.clusters
    // exact groups: always one cluster
    byGroup.filter(_._1._1 == "exact").foreach { case (g, ms) =>
      assert(ms.map(m => clusters(m._1)).distinct.size === 1, s"exact group $g split")
    }
    // contained pairs: same cluster (suffix pass)
    byGroup.filter(_._1._1 == "contained").filter(_._2.size == 2).foreach { case (g, ms) =>
      assert(ms.map(m => clusters(m._1)).distinct.size === 1, s"contained pair $g split")
    }
    // boilerplate: headers alone must NOT merge docs of different tails into
    // mega-clusters: the largest boiler-only cluster stays small
    val boilerIds = ids.zip(labels).filter(_._2.family == "boiler").map(_._1)
    if (boilerIds.nonEmpty) {
      val sizes = boilerIds.groupBy(clusters).values.map(_.size)
      assert(sizes.max <= math.max(5, boilerIds.size / 10),
        s"boilerplate created a mega-cluster: ${sizes.max} of ${boilerIds.size}")
    }
  }

  test("first stories = docs with no verified neighbor (novelty operator)") {
    val novel = DedupPipeline.firstStories(result).as[Long].collect().toSet
    val endpoints = oracle.verifiedPairs.flatMap(p => Seq(p._1, p._2))
    val expected = oracle.sha256.keySet -- endpoints
    assert(novel === expected)
    // planted sanity: a doc from a multi-member exact-dup group can never be
    // a first story (its exact twin is a verified neighbor by construction)
    val ids = corpus.map(ReferenceOracle.docId)
    val fam = ids.zip(labels).toMap
    val groupSizes = labels.groupBy(l => (l.family, l.groupId)).view.mapValues(_.size).toMap
    novel.foreach { id =>
      val l = fam(id)
      assert(!(l.family == "exact" && groupSizes((l.family, l.groupId)) >= 2),
        s"exact dup $id flagged as first story")
    }
    // and the bulk of unique docs ARE first stories
    val uniqueIds = ids.zip(labels).filter(_._2.family == "unique").map(_._1)
    val uniqueNovel = uniqueIds.count(novel)
    assert(uniqueNovel.toDouble / uniqueIds.size >= 0.95,
      s"only $uniqueNovel/${uniqueIds.size} unique docs flagged novel")
  }

  test("pipeline verified pairs: boilerplate-only pairs are absent") {
    val fam = corpus.map(ReferenceOracle.docId).zip(labels).toMap
    val got = result.verifiedPairs.select("a", "b").as[(Long, Long)].collect()
    val boilerPairs = got.filter { case (a, b) =>
      fam(a).family == "boiler" && fam(b).family == "boiler"
    }
    // boiler docs have unique tails: header-driven pairing would be
    // QUADRATIC in the per-header group size (~C(n/3, 2) ≈ 850+ here);
    // a handful of borderline τ-crossers is legitimate (they exist in the
    // oracle too — set equality is asserted above).
    val nBoiler = fam.values.count(_.family == "boiler")
    assert(boilerPairs.length <= nBoiler / 4,
      s"${boilerPairs.length} boilerplate pairs for $nBoiler boiler docs")
  }
}
