package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.conf.DedupConfig

/** The scaling protocols' synthetic corpus shapes are measurement
  * instruments — their dup structure must be what the BASELINE.md analysis
  * claims, or the efficiency numbers measure the wrong thing.
  *
  *  - "mixed": non-dup replicas APPEND junk, so the base text stays a
  *    verbatim prefix — for docs ≥ suffixMinLen tokens the suffix pass
  *    correctly links every replica to its base (documented adversarial
  *    ~100% dup mass at long lengths).
  *  - "interleave": non-dup replicas interleave junk token-by-token — no
  *    shared 5-shingle, no shared 50-token run, TRUE non-duplicates (the
  *    realistic ~25% dup-mass shape the content-weighted protocol uses).
  */
class BenchCorpusSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val cfg = DedupConfig.default
  private val d = "/root/testdata/sf0.001"

  /** (origId, rep) parsed back from the replica path 'doc/<id>/<rep>'. */
  private def parts(path: String): (Long, Int) = {
    val p = path.split('/')
    (p(1).toLong, p(2).toInt)
  }

  test("interleave: non-dup replicas are true non-dups; near-dups still cluster") {
    // mult=4 → per base doc: rep0 = original, rep1 = near-dup (pmod 5 == 1),
    // reps 2..3 = interleaved junk
    val t1 = Bench.benchT1(spark, d, mult = 4, dupMode = "interleave", lenMult = 2)
      .repartition(8).persist()
    val res = DedupPipeline.run(spark, t1, cfg)
    val byDoc = t1.select($"doc_id", $"path").as[(Long, String)].collect()
      .map { case (id, p) => id -> parts(p) }.toMap
    val edges = res.verifiedPairs.select("a", "b").as[(Long, Long)].collect()

    // no verified edge touches an interleaved replica (rep 2 or 3)
    val badEdges = edges.filter { case (a, b) =>
      byDoc(a)._2 >= 2 || byDoc(b)._2 >= 2
    }
    assert(badEdges.isEmpty,
      s"interleaved replicas must be non-duplicates; got ${badEdges.take(5).toSeq}")

    // every (rep0, rep1) pair with ≥ suffixMinLen tokens IS linked — after
    // lenMult=2 padding the shared body is ≥ 2× the base token count, so
    // the suffix pass guarantees the containment edge even when the
    // est-Jaccard of a short doc is borderline
    val tokLen = t1.where(not($"path".rlike("/[23]$")))
      .select($"doc_id", size(split($"content", "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    val linked = edges.map { case (a, b) => Set(byDoc(a), byDoc(b)) }.toSet
    val expected = byDoc.values.collect { case (id, 0) => id }.toSet
      .filter { id =>
        val d0 = byDoc.collectFirst { case (eid, (`id`, 0)) => eid }.get
        tokLen(d0) >= cfg.suffixMinLen
      }
    val missing = expected.filterNot { id =>
      linked.contains(Set((id, 0), (id, 1)))
    }
    assert(missing.isEmpty, s"near-dup replica pairs missing for bases: ${missing.take(5)}")

    res.release()
    t1.unpersist(blocking = false)
  }

  test("mixed at long lengths: appended junk keeps the base as a prefix (suffix clique)") {
    val t1 = Bench.benchT1(spark, d, mult = 4, dupMode = "mixed", lenMult = 2)
      .repartition(8).persist()
    val res = DedupPipeline.run(spark, t1, cfg)
    val byDoc = t1.select($"doc_id", $"path").as[(Long, String)].collect()
      .map { case (id, p) => id -> parts(p) }.toMap
    // pick one base doc with ≥ suffixMinLen tokens: all 4 replicas must land
    // in ONE cluster (the documented adversarial property)
    val tokLen = t1.select($"doc_id", size(split($"content", "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    val bigBase = byDoc.collect {
      case (eid, (id, 0)) if tokLen(eid) >= cfg.suffixMinLen => id
    }.head
    val cl = res.clusters.as[(Long, Long)].collect().toMap
    val members = byDoc.collect { case (eid, (`bigBase`, _)) => cl(eid) }.toSet
    assert(members.size === 1,
      s"mixed-mode replica group of base $bigBase should be one suffix clique")
    res.release()
    t1.unpersist(blocking = false)
  }
}
