package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extra.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def naiveTopK(k: Int, nQueries: Int): Map[Long, Seq[Long]] = {
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    all.take(nQueries).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(k).map(_._1).toSeq
    }.toMap
  }

  test("brute-force top-k matches a naive local computation") {
    val got = Similarity.bruteForceTopK(spark, sfDir, k = 5, nQueries = 10)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    val expect = naiveTopK(5, 10)
    assert(got.keySet === expect.keySet)
    got.foreach { case (q, ns) => assert(ns === expect(q), s"query $q") }
  }

  test("LSH top-k finds a decent fraction of the true neighbors (recall sanity)") {
    val brute = Similarity.bruteForceTopK(spark, sfDir, k = 5, nQueries = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // the high-recall 16×4 single-probe config, requested EXPLICITLY — the
    // defaults are the scale-safe 8×8 multi-probe (asserted in the
    // multi-probe test below); generic top-k neighbors are weak (cos ≈ 0.3)
    // so this variant is banding tuned for recall
    val lsh = Similarity.lshTopK(spark, sfDir, k = 5, nQueries = 10,
        tables = 16, multiProbe = false)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall vs brute force: $recall")
  }

  test("multi-probe 8x8 trades bounded recall loss for far fewer candidates than 16x4") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[Similarity.Emb]
    val qids = emb.orderBy("vec_id").limit(10).collect().map(_.vec_id)
    val wide = Similarity.lshCandidates(spark, emb, qids, 64, 16, 100000, multiProbe = false)
    val mp = Similarity.lshCandidates(spark, emb, qids, 64, 8, 100000, multiProbe = true)
    val nWide = wide.count(); val nMp = mp.count()
    assert(nMp < nWide, s"multi-probe candidates ($nMp) should undercut 16x4 ($nWide)")

    val brute = Similarity.bruteForceTopK(spark, sfDir, k = 5, nQueries = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 8×8 multi-probe IS the default config now — call it as such, so this
    // floor covers exactly what a default caller gets
    val got = Similarity.lshTopK(spark, sfDir, k = 5, nQueries = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.35, s"multi-probe recall vs brute force: $recall (cands=$nMp vs $nWide)")
  }

  test("lshRecall surface: total row per query, aggregate floor holds") {
    val rows = Similarity.lshRecall(spark, sfDir, k = 5, nQueries = 10)
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 10, "every query must emit a row (recall-0 included)")
    assert(rows.forall { case (_, ov, k) => ov >= 0 && ov <= k })
    val recall = rows.map(_._2).sum.toDouble / rows.map(_._3).sum
    // same floor as the default (8×8 multi-probe) top-k config it measures
    assert(recall >= 0.35, s"aggregate overlap@5: $recall")
  }

  test("ivfRecall surface: total row per query, aggregate floor holds") {
    val rows = Similarity.ivfRecall(spark, sfDir, k = 5, nQueries = 10)
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 10, "every query must emit a row (recall-0 included)")
    assert(rows.forall { case (_, ov, k) => ov >= 0 && ov <= k })
    val recall = rows.map(_._2).sum.toDouble / rows.map(_._3).sum
    // same floor as the direct IVF-vs-brute test below
    assert(recall >= 0.5, s"aggregate overlap@5: $recall")
  }

  test("IVF top-k recall vs brute force") {
    val brute = Similarity.bruteForceTopK(spark, sfDir, k = 5, nQueries = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, sfDir, k = 5, nQueries = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall vs brute force: $recall")
  }

  test("embedding dup clusters: total assignment, transitive closure holds") {
    val got = Similarity.embeddingDupClusters(spark, sfDir, threshold = 0.5)
      .as[(Long, Long)].collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(got.length === n)
    // cluster id must be the min member of its cluster
    got.groupBy(_._2).foreach { case (cid, ms) =>
      assert(ms.map(_._1).min === cid, s"cluster $cid not labeled by min member")
    }
  }

  test("embedding dup clusters invariant under bucket salting (tiny maxBucket)") {
    // forcing every sketch bucket through the salted triangle scheme must
    // not change the emitted cluster partition (same invariant SaltingSpec
    // proves for the MinHash path, here via the shared generateJoin)
    val base = Similarity.embeddingDupClusters(spark, sfDir, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    val salted = Similarity.embeddingDupClusters(spark, sfDir, threshold = 0.5, maxBucket = 3)
      .as[(Long, Long)].collect().toMap
    assert(salted === base)
  }

  test("profile: dims constant, norms positive") {
    val p = Similarity.profile(spark, sfDir).as[(Long, Long, Long)].collect()
    assert(p.map(_._2).distinct.length === 1)
    assert(p.forall(_._3 > 0)) // norm_e4 = floor(norm·1e4 + 0.5)
  }
}
