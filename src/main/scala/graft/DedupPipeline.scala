package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig
import graft.kernel.SignatureKernel
import graft.model.DocRow

/** The end-to-end near-duplicate pipeline as lazy DataFrames
  * (SURVEY.md §3.2). [[graft.Dedup]] adds per-stage checkpointing/lineage on
  * top; SparkEntry.queries exposes individual stages for the driver's
  * correctness/bench loop.
  */
object DedupPipeline {

  final case class Result(
      t1: DataFrame,
      signatures: DataFrame,
      bands: DataFrame,
      candidatePairs: DataFrame,
      verifiedPairs: DataFrame,
      clusters: DataFrame,
      clusterStats: DataFrame,
      stopBands: DataFrame,
      extraCaches: Seq[DataFrame] = Nil) {
    /** Drop the pipeline-owned cached stages — one-shot callers
      * (benchmarks, repeated run() in one session) must release or the
      * multi-million-row pair caches pin executor memory for the session's
      * life. `t1` is caller-provided (run() persists the caller's handle)
      * and stays cached for the caller to manage. `extraCaches` holds
      * internal persisted intermediates (t1Distinct, raw LSH pairs) that no
      * Result field exposes but that must not outlive the release.
      */
    def release(): Unit =
      (Seq(signatures, bands, candidatePairs, verifiedPairs, clusters) ++ extraCaches)
        .foreach(_.unpersist(blocking = false))
  }

  /** T1 → T3: the fused shingle+MinHash+SimHash typed kernel. Permutation
    * coefficients are built once per partition; the serde boundary
    * (InternalRow → DocRow → Signature) is deliberate and confined to this
    * one stage.
    */
  def signatures(spark: SparkSession, t1: DataFrame, cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    t1.select(col("doc_id"), col("lang"), col("content")).as[DocRow]
      .mapPartitions { it =>
        val coefs = new SignatureKernel.PermCoefs(cfg.numPerms, cfg.seed)
        it.map(d => SignatureKernel.signature(d.doc_id, d.content, cfg, coefs))
      }
      .toDF()
  }

  /** Shingle arrays (T2) — exposed for exact-Jaccard tests/calibration, not
    * on the main path (the fused kernel never materializes T2).
    */
  def shingled(spark: SparkSession, t1: DataFrame, cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    t1.select(col("doc_id"), col("lang"), col("content")).as[DocRow]
      .mapPartitions { it =>
        it.map { d =>
          val sh = SignatureKernel.shingles(
            SignatureKernel.tokenHashes(d.content, cfg.seed), cfg.shingleK, cfg.seed)
          (d.doc_id, sh, sh.length)
        }
      }
      .toDF("doc_id", "shingles", "n_shingles")
  }

  /** Assemble the full pipeline lazily from a T1 docs table.
    *
    * `t1` and `signatures` are referenced by several downstream stages
    * (bands, both verify joins, exact pairs, suffix pass, final assign) —
    * persist them so the expensive kernel runs once per action graph. The
    * spark-submit path ([[Dedup]]) gets the same effect by checkpointing
    * every stage to a table and reading it back.
    */
  def run(spark: SparkSession, t1in: DataFrame, cfg: DedupConfig = DedupConfig.default,
      withSuffixPass: Boolean = true): Result = {
    // t1Distinct is derived from t1 but t1in may itself be persisted by the
    // caller; persist our own handle (idempotent if already cached)
    val t1 = t1in.persist()
    // LSH/suffix run over sha-distinct docs only (one representative per
    // identical content): identical docs have identical signatures, so
    // their pairs are fully implied by the exact-star edges — and at
    // 10^12-file scale the identical-content mass (empty files, generated
    // code) is the single biggest pair-explosion source. Cluster output is
    // unchanged: rep↔member exact edges glue the components together.
    val t1Distinct = distinctByContent(t1).persist()
    val sigs = signatures(spark, t1Distinct, cfg).persist()
    // bands feed two independent broadcast subtrees (stop + hot counts) and
    // the salted join — persist so the posexplode isn't recomputed per branch
    val bands = lsh.Banding.bandRows(sigs, cfg).persist()

    // The suffix pass materializes its candidate table EAGERLY at call time
    // (localCheckpoint under AQE — see SuffixPass), which used to serialize
    // the whole gram shuffle AHEAD of every LSH-side job. The two subtrees
    // are independent until the verified union, so run the suffix pass on
    // its own thread and spend the wait materializing the sigs/bands caches
    // every later action needs anyway — work moved earlier, not added (the
    // caller's first action no longer pays it). t1Distinct is materialized
    // FIRST, before the fork: both branches read it, and two cold racers
    // would otherwise each run the ingest + sha-distinct shuffles.
    val suffixFut =
      if (withSuffixPass) {
        t1Distinct.count(): Unit
        val out = new java.util.concurrent.CompletableFuture[DataFrame]()
        val th = new Thread(() =>
          try out.complete(suffix_.containmentPairs(spark, t1Distinct, cfg)
            .select(col("a"), col("b"), col("src")))
          catch { case e: Throwable => out.completeExceptionally(e) },
          "graft-suffix-pass")
        th.setDaemon(true)
        th.start()
        Some(out)
      } else None
    if (withSuffixPass) bands.count(): Unit

    val (lshPairs0, stopBands) =
      if (cfg.pairGenJoin) lsh.CandidatePairs.generateJoin(spark, bands, cfg)
      else lsh.CandidatePairs.generate(spark, bands, cfg)
    // the raw LSH pair subtree feeds BOTH the verified tree and the
    // candidate-reporting tree; persisted so consuming both (the staged
    // CLI, prewarmPipeline) runs pair generation once, not twice
    val lshPairs = lshPairs0.persist()
    // exact-star edges reuse t1Distinct's (sha → min doc_id) instead of
    // re-aggregating the full corpus (one groupBy shuffle of t1 saved)
    val repsBySha = t1Distinct.select(col("content_sha256"), col("doc_id").as("rep"))
    val exact = lsh.CandidatePairs.exactPairsFromReps(t1, repsBySha)
    val suffix = suffixFut.map(_.get()).getOrElse(spark.emptyDataFrame)

    // Verified edge set: LSH pairs pass Jaccard/Hamming; exact and suffix
    // pairs are verified by construction. Canonical union with src priority.
    val lshVerified = verify.Verifier.verifyLshPairs(lshPairs, sigs, cfg)
    val exactV = exact.withColumn("est_jaccard", lit(1.0d)).select("a", "b", "est_jaccard", "src")
    val suffixV =
      if (withSuffixPass)
        suffix.withColumn("est_jaccard", lit(1.0d)).select("a", "b", "est_jaccard", "src")
      else null
    val unionAll =
      if (withSuffixPass) lshVerified.unionByName(exactV).unionByName(suffixV)
      else lshVerified.unionByName(exactV)
    // verified/clusters/candidates feed several downstream consumers (stats,
    // members, novelty, the driver's per-stage queries) — persist so the
    // pair/verify/CC subtrees run once per session, not once per consumer
    val verified = lsh.CandidatePairs.strongestWithEst(unionAll).persist()

    // Exact-dup members are pendant vertices: LSH/suffix pairs only touch
    // sha-reps, so a member's sole edge is (rep, member). CC therefore runs
    // on the rep-only edge set and members are attached afterward through
    // the sha→rep mapping — at 10^12-file scale this keeps the iterative
    // CC graph free of the identical-content mass entirely.
    val repEdges = verified.where(col("src") =!= "exact").select("a", "b")
    val repMapping = cc.ConnectedComponents.run(spark, repEdges)
    val clusters = attachMembersVia(t1, repMapping, repsBySha).persist()

    val stats = clusters.join(t1.select("doc_id", "repo"), "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("size"),
        countDistinct(col("repo")).as("n_repos"),
        min(col("doc_id")).as("rep_doc"))

    // All candidate sources, canonicalized (T5) — for reporting/fixtures.
    val candidates = lsh.CandidatePairs.strongest(
      if (withSuffixPass) lshPairs.unionByName(exact).unionByName(suffix)
      else lshPairs.unionByName(exact)).persist()

    Result(t1, sigs, bands, candidates, verified, clusters, stats, stopBands,
      extraCaches = Seq(t1Distinct, lshPairs))
  }

  private val suffix_ = graft.suffix.SuffixPass

  /** First-story / novelty detection — the reference's headline capability
    * (Petrović et al., NAACL-HLT 2010: a document whose nearest neighbor is
    * farther than the threshold "starts a new story"). In the batch engine
    * that is exactly: documents with NO verified near-duplicate neighbor —
    * one left_anti join against the verified edge endpoints. Scale shape:
    * the endpoint set is a projection of the (already bounded) verified
    * edge table, and left_anti plans as a shuffled hash anti-join on doc_id.
    */
  def firstStories(res: Result): DataFrame = {
    val endpoints = res.verifiedPairs.select(col("a").as("doc_id"))
      .unionByName(res.verifiedPairs.select(col("b").as("doc_id")))
    res.t1.join(endpoints, Seq("doc_id"), "left_anti").select("doc_id")
  }

  /** One representative row (min doc_id) per distinct content_sha256.
    *
    * Scale note: this is the pipeline's ONE full-content shuffle (the
    * join-back moves content rows by key). The alternative — sign ALL docs
    * in the narrow kernel and dedup the 1 KB signature rows instead — would
    * avoid it, but the suffix/containment pass needs representative CONTENT
    * anyway, so materializing the rep table once (checkpointed in the
    * staged path) is the cheaper total: every downstream stage then reads
    * the ~dedup'd corpus without touching the identical-content mass.
    */
  def distinctByContent(t1: DataFrame): DataFrame = {
    val reps = t1.groupBy("content_sha256").agg(min("doc_id").as("doc_id"))
    t1.join(reps, Seq("content_sha256", "doc_id"))
  }

  /** Full cluster assignment from a rep-only CC mapping: every doc routes
    * through its sha-rep; reps without an LSH/suffix edge head their own
    * (possibly multi-member) exact cluster.
    */
  def attachMembers(t1: DataFrame, repMapping: DataFrame): DataFrame =
    attachMembersVia(t1, repMapping,
      t1.groupBy("content_sha256").agg(min("doc_id").as("rep")))

  /** [[attachMembers]] with the (content_sha256 → rep) table supplied by the
    * caller — run() passes t1Distinct's projection so the full corpus is not
    * re-aggregated a second time for a mapping it already holds.
    */
  def attachMembersVia(t1: DataFrame, repMapping: DataFrame, repsBySha: DataFrame): DataFrame = {
    val docRep = t1.select(col("doc_id"), col("content_sha256"))
      .join(repsBySha, "content_sha256")
    docRep
      .join(repMapping.withColumnRenamed("doc_id", "rep"), Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
  }
}
