package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

import graft.conf.DedupConfig
import graft.testutil.FixtureGen

/** Checkpoint/resume semantics (SURVEY.md §5.2 property 6):
  *  - a second run over unchanged input recomputes nothing;
  *  - a run killed mid-pipeline resumes from the last complete stage and
  *    produces output identical to an uninterrupted run;
  *  - a config change invalidates everything.
  */
class ResumeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val cfg = DedupConfig(maxBandSize = 25)
  private lazy val corpus = spark.createDataFrame(FixtureGen.corpus(400, 7L))
    .select("repo", "path", "commit", "lang", "content")

  private def freshDir(): String =
    Files.createTempDirectory("graft-resume").toString

  test("full rerun over unchanged input computes zero stages") {
    val dir = freshDir()
    val first = Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400")
    assert(first.computed === Seq("t1", "t1_distinct", "signatures", "bands",
      "candidate_pairs", "verified_pairs", "clusters", "cluster_stats"))
    val second = Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400")
    assert(second.computed.isEmpty, s"recomputed: ${second.computed}")
    assert(second.clusters.as[(Long, Long)].collect().toMap ===
      first.clusters.as[(Long, Long)].collect().toMap)
  }

  test("kill after 'bands' resumes exactly the remaining stages with identical output") {
    val dirA = freshDir(); val dirB = freshDir()
    // uninterrupted reference run
    val ref = Dedup.run(spark, corpus, dirA, cfg, inputId = "fixture400")
    // partial run (simulated kill after bands), then resume
    val partial = Dedup.run(spark, corpus, dirB, cfg, inputId = "fixture400", stopAfter = "bands")
    assert(partial.computed === Seq("t1", "t1_distinct", "signatures", "bands"))
    val resumed = Dedup.run(spark, corpus, dirB, cfg, inputId = "fixture400")
    assert(resumed.computed === Seq("candidate_pairs", "verified_pairs", "clusters", "cluster_stats"))
    assert(resumed.clusters.as[(Long, Long)].collect().toMap ===
      ref.clusters.as[(Long, Long)].collect().toMap)
  }

  test("incomplete stage write (no _SUCCESS) is recomputed") {
    val dir = freshDir()
    Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400", stopAfter = "signatures")
    // corrupt: drop the _SUCCESS marker of signatures
    val p = new Path(s"$dir/signatures/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    val resumed = Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400", stopAfter = "signatures")
    assert(resumed.computed === Seq("signatures"))
  }

  test("config change invalidates the chain") {
    val dir = freshDir()
    Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400")
    val changed = Dedup.run(spark, corpus, dir, cfg.copy(jaccardTau = 0.8), inputId = "fixture400")
    assert(changed.computed.nonEmpty)
    assert(changed.computed.head === "t1") // whole chain fingerprint shifts
  }

  test("semantic knob change (stopBandSize) invalidates; execution knob (maxBandSize) does not") {
    val dir = freshDir()
    Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400")
    // maxBandSize only re-shards hot groups (pair set invariant, SaltingSpec)
    // — flipping it must reuse every stage
    val exec = Dedup.run(spark, corpus, dir, cfg.copy(maxBandSize = 99), inputId = "fixture400")
    assert(exec.computed.isEmpty, s"execution knob invalidated: ${exec.computed}")
    // stopBandSize changes which band groups are dropped → pair set changes
    // → the whole chain must recompute
    val sem = Dedup.run(spark, corpus, dir, cfg.copy(stopBandSize = 19999), inputId = "fixture400")
    assert(sem.computed.nonEmpty && sem.computed.head === "t1",
      s"semantic knob did not invalidate: ${sem.computed}")
    // suffixDfMax changes which grams anchor containment candidates → same
    val sem2 = Dedup.run(spark, corpus, dir, cfg.copy(suffixDfMax = 63), inputId = "fixture400")
    assert(sem2.computed.nonEmpty, "suffixDfMax change did not invalidate")
  }

  test("stop_bands log has its own lineage row in lockstep with candidate_pairs") {
    val dir = freshDir()
    Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400")
    val meta = io.StageMeta.read(spark, new io.ParquetCatalog(dir))
    val fps = meta.where($"stage".isin("stop_bands", "candidate_pairs"))
      .select("stage", "input_fingerprint").distinct()
      .as[(String, String)].collect().toMap
    assert(fps.keySet === Set("stop_bands", "candidate_pairs"))
    // same chain fingerprint: a resumed run can never keep a stale stop-band
    // log alongside a fresh pairs table
    assert(fps("stop_bands") === fps("candidate_pairs"))
  }

  test("per-partition lineage rows exist with honest observed row counts") {
    val dir = freshDir()
    Dedup.run(spark, corpus, dir, cfg, inputId = "fixture400")
    val meta = io.StageMeta.read(spark, new io.ParquetCatalog(dir))
    // total row count is observed during the write job (no read-back pass)
    val sigRows = meta.where($"stage" === "signatures" && $"partition_file" === "_total")
      .agg(org.apache.spark.sql.functions.sum("rows")).as[Long].head()
    val nReps = corpus.select("content").distinct().count()
    assert(sigRows === nReps) // signatures are per sha-distinct representative
    // per-file byte sizes still recorded
    val sigBytes = meta.where($"stage" === "signatures" && $"partition_file" =!= "_total")
      .agg(org.apache.spark.sql.functions.sum("bytes")).as[Long].head()
    assert(sigBytes > 0)
    val stages = meta.select("stage").distinct().as[String].collect().toSet
    assert(stages.contains("clusters") && stages.contains("candidate_pairs"))
  }
}
