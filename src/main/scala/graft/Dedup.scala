package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig
import graft.io.{ParquetCatalog, StageMeta}

/** The spark-submit pipeline entry point with checkpoint-every-stage and
  * exact resume (SURVEY.md §3.2, north rule "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * Every stage is written to the work-dir catalog and read BACK before the
  * next stage — this (a) truncates lineage so no stage ever re-executes an
  * upstream kernel, (b) guarantees the huge `content` column is never
  * scanned after `signatures`/`tokens` are materialized, and (c) makes each
  * stage independently resumable.
  *
  * Resume rule: a stage is skipped iff its `_SUCCESS` marker exists AND the
  * fingerprint recorded in stage_meta equals the fingerprint recomputed
  * from (config, upstream chain, input identity). Changing the config or
  * the input invalidates exactly the affected suffix of the stage graph.
  */
object Dedup {

  final case class StagedResult(computed: Seq[String], clusters: DataFrame)

  /** Deterministic identity of the input files (names, sizes, mtimes) —
    * no Spark job needed.
    */
  def inputIdentity(spark: SparkSession, inputPath: String): String = {
    val p = new Path(inputPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.globStatus(new Path(inputPath))
      .flatMap { s =>
        if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s)
      }
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted
    Hashing.xxString(parts.mkString("|"), Hashing.DefaultSeed).toHexString
  }

  def run(
      spark: SparkSession,
      corpus: DataFrame,
      workDir: String,
      cfg: DedupConfig = DedupConfig.default,
      inputId: String = "inline",
      runId: String = java.util.UUID.randomUUID().toString,
      stopAfter: String = ""): StagedResult = {

    val cat = new ParquetCatalog(workDir)
    val computed = scala.collection.mutable.ArrayBuffer.empty[String]
    var chainFp = Hashing.xxString(cfg.fingerprint + "|" + inputId, Hashing.DefaultSeed).toHexString

    /** Compute-or-reuse one stage; returns the stage read back from disk.
      * Row counts ride an `observe` on the write job itself (no extra pass
      * over the written stage — re-reading a checkpoint to count it would
      * double every stage's I/O at corpus scale).
      */
    def stage(name: String)(build: => DataFrame): DataFrame = {
      chainFp = Hashing.xxString(chainFp + "|" + name, Hashing.DefaultSeed).toHexString
      val reusable = cat.exists(spark, name) &&
        StageMeta.lastFingerprint(spark, cat, name).contains(chainFp)
      if (!reusable) {
        val t0 = System.nanoTime()
        val obs = org.apache.spark.sql.Observation(s"stage_${name}_$t0")
        cat.write(build.observe(obs, count(lit(1)).as("rows")), name)
        val rows = obs.get.get("rows").collect { case l: Long => l }.getOrElse(-1L)
        StageMeta.record(spark, cat, runId, name, chainFp,
          (System.nanoTime() - t0) / 1000000, rows)
        computed += name
      }
      cat.read(spark, name)
    }
    def done(name: String) = stopAfter.nonEmpty && stopAfter == name

    val t1 = stage("t1")(ingest.Ingest.ingest(corpus))
    if (done("t1")) return StagedResult(computed.toSeq, t1)

    // LSH and the suffix pass operate on sha-distinct representatives only
    // (see DedupPipeline.run scaladoc); exact-star edges reconnect members.
    val t1d = stage("t1_distinct")(DedupPipeline.distinctByContent(t1))
    if (done("t1_distinct")) return StagedResult(computed.toSeq, t1d)

    val sigs = stage("signatures")(DedupPipeline.signatures(spark, t1d, cfg))
    if (done("signatures")) return StagedResult(computed.toSeq, sigs)

    val bands = stage("bands")(lsh.Banding.bandRows(sigs, cfg))
    if (done("bands")) return StagedResult(computed.toSeq, bands)

    val pairs = stage("candidate_pairs") {
      val (lshPairs, stopBands) =
        if (cfg.pairGenJoin) lsh.CandidatePairs.generateJoin(spark, bands, cfg)
        else lsh.CandidatePairs.generate(spark, bands, cfg)
      // stop_bands: small side table written inside this stage's closure,
      // with its own lineage row (same chain fingerprint as candidate_pairs
      // — it is a byproduct of exactly this computation) so a resumed run
      // can never pair a fresh pairs table with a stale stop-band log.
      val obsStop = org.apache.spark.sql.Observation(s"stage_stop_bands_${System.nanoTime()}")
      cat.write(stopBands.observe(obsStop, count(lit(1)).as("rows")), "stop_bands")
      StageMeta.record(spark, cat, runId, "stop_bands", chainFp, 0L,
        obsStop.get.get("rows").collect { case l: Long => l }.getOrElse(-1L))
      val exact = lsh.CandidatePairs.exactPairs(t1)
      val sfx = suffix.SuffixPass.containmentPairs(spark, t1d, cfg).select("a", "b", "src")
      // strongest (not alphabetical min): a pair found by BOTH the suffix
      // pass and an LSH band must stay 'suffix' so the verified_pairs stage
      // treats it as verified-by-construction (matches DedupPipeline.run
      // and the in-repo oracle, which verify LSH pairs before the union).
      lsh.CandidatePairs.strongest(lshPairs.unionByName(exact).unionByName(sfx))
    }
    if (done("candidate_pairs")) return StagedResult(computed.toSeq, pairs)

    val verified = stage("verified_pairs") {
      val lshSide = verify.Verifier.verifyLshPairs(
        pairs.where(col("src").isin("minhash", "simhash")), sigs, cfg)
      val byConstruction = pairs.where(col("src").isin("exact", "suffix"))
        .withColumn("est_jaccard", lit(1.0d)).select("a", "b", "est_jaccard", "src")
      lsh.CandidatePairs.strongestWithEst(lshSide.unionByName(byConstruction))
    }
    if (done("verified_pairs")) return StagedResult(computed.toSeq, verified)

    val clusters = stage("clusters") {
      // rep-only CC + pendant-member attach (see DedupPipeline.run)
      val repEdges = verified.where(col("src") =!= "exact").select("a", "b")
      val repMapping = cc.ConnectedComponents.run(spark, repEdges)
      DedupPipeline.attachMembers(t1, repMapping)
    }
    if (done("clusters")) return StagedResult(computed.toSeq, clusters)

    val stats = stage("cluster_stats") {
      clusters.join(t1.select("doc_id", "repo"), "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("size"),
          countDistinct(col("repo")).as("n_repos"),
          min(col("doc_id")).as("rep_doc"))
    }
    StagedResult(computed.toSeq, if (stopAfter == "cluster_stats") stats else clusters)
  }

  /** spark-submit --class graft.Dedup <inputParquet> <workDir> */
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Dedup <inputParquet> <workDir>")
      sys.exit(2)
    }
    val Array(input, workDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-dedup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(input)
    // Accept either the canonical corpus schema (input_hint) or the driver's
    // documents shape, mapped per FIXTURES.md §4.
    val corpus =
      if (raw.columns.contains("repo"))
        raw.select("repo", "path", "commit", "lang", "content")
      else
        raw.select(col("source").as("repo"),
          concat(lit("doc/"), col("doc_id")).as("path"), lit("v0").as("commit"),
          col("lang"), col("text").as("content"))
    // Small inputs arrive as a handful of parquet files; spread them so the
    // ingest/signature kernels parallelize (no-op cost at real scale, where
    // the scan already yields thousands of partitions).
    val spread = corpus.repartition(spark.sparkContext.defaultParallelism * 2)
    // GRAFT_SUFFIX_MODE=winnow [GRAFT_WINNOW_K=n] selects the winnowed
    // suffix index (the 100-TB memory lever — ~13× smaller index at
    // verified recall 1.0, BASELINE round-5). Semantic knob: it enters the
    // config fingerprint, so switching modes invalidates exactly the
    // suffix-dependent stage suffix on resume instead of silently mixing
    // indexes. Df-cap caveat at the knob: see DedupConfig.suffixIndexMode.
    val cfg = DedupConfig.default.copy(
      suffixIndexMode = sys.env.getOrElse("GRAFT_SUFFIX_MODE", "grams"),
      winnowK = sys.env.getOrElse("GRAFT_WINNOW_K", "0").toInt)
    val res = run(spark, spread, workDir, cfg, inputId = inputIdentity(spark, input))
    println(s"[dedup] computed stages: ${res.computed.mkString(", ")}; " +
      s"clusters=${res.clusters.count()}")
    spark.stop()
  }
}
