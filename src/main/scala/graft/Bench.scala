package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract). Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "cpus":N,"n_docs":N,"files_per_sec":N}
  *
  * Env knobs:
  *  - SPARK_GRAFT_SF_DIR  input dir (default sf0.1)
  *  - SPARK_GRAFT_CPUS    local[N] threads = shuffle partitions
  *  - SPARK_GRAFT_MULT    corpus inflation factor for scaling runs: each doc
  *    is replicated MULT times with a distinct suffix + identity, giving a
  *    deterministic larger corpus with heavy near-dup structure (the
  *    worst-case load for pair generation). Used for the N-vs-4N-cores
  *    scaling-efficiency evidence in BASELINE.md.
  */
object Bench {

  /** documents.parquet mapped to T1, optionally inflated ×mult.
    *
    * Two inflation shapes (SPARK_GRAFT_DUPMODE):
    *  - "mixed" (default): per base doc, replica 0 is the original, every
    *    5th replica is a near-dup (tiny suffix), the rest get a unique
    *    hash-derived second half (Jaccard ≈ 0.33 ≪ τ). ≈25% duplicate mass
    *    in ~5-doc clusters — the realistic web-corpus shape.
    *  - "clique": every replica is a near-dup of the base → `mult`-cliques,
    *    quadratic pair mass. Adversarial stress test for pair generation.
    *  - "interleave": like mixed, but non-dup replicas INTERLEAVE the junk
    *    token-by-token instead of appending it — no 5-shingle and no
    *    50-token run survives, so they are true non-duplicates. Use for
    *    content-weighted runs: mixed's appended junk leaves the base text
    *    as a verbatim prefix, which the suffix pass correctly flags as
    *    containment — at realistic doc lengths that turns every replica
    *    group into one big suffix clique (≈100% dup mass, adversarial),
    *    where a real web corpus has ~25%.
    *
    * `lenMult` (SPARK_GRAFT_LENMULT) is the CONTENT-WEIGHTED knob for the
    * scaling protocol: each base doc's text is padded to ~lenMult× its
    * token count with deterministic per-(doc, segment) unique tokens
    * BEFORE replication, so (a) near-dup replicas share the whole padded
    * body — real near-dups at realistic document lengths — and (b) shingle
    * mass scales ~linearly with lenMult. The driver corpus averages only
    * ~54 tokens/doc, which makes the default bench shape adversarially
    * shuffle-bound; a real pre-training corpus (1–4k tokens/doc) is
    * kernel-dominated, and this knob reproduces that phase mix.
    */
  def benchT1(spark: SparkSession, sfDir: String, mult: Int, dupMode: String = "mixed",
      lenMult: Int = 1): DataFrame =
    ingest.Ingest.ingest(benchCorpus(spark, sfDir, mult, dupMode, lenMult))

  /** The raw (pre-ingest) corpus of [[benchT1]] — reused by the incremental
    * profiler, which feeds corpus-shaped batches through processBatch.
    */
  def benchCorpus(spark: SparkSession, sfDir: String, mult: Int, dupMode: String = "mixed",
      lenMult: Int = 1): DataFrame = {
    // single small parquet file = ONE scan partition: spread BEFORE the
    // pad/replicate transforms or the whole corpus construction runs on one
    // core (measured 89 s single-task at MULT=10 × LENMULT=32 — pure
    // harness overhead ahead of every timed run)
    val base0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val base =
      if (lenMult <= 1) base0
      else {
        // one-time corpus construction (runs before the timed section, the
        // t1 persist materializes it): interpreted higher-order exprs are
        // fine here, unlike on the per-query hot paths
        val ntok = size(split(col("text"), "\\s+"))
        val pads = (1 until lenMult).map { seg =>
          // sign-safe: abs(Long.MinValue) throws under ANSI (~2^-64/token,
          // but a corpus build must not be able to abort on it)
          concat_ws(" ", transform(sequence(lit(1), ntok),
            i => conv(shiftrightunsigned(xxhash64(col("doc_id"), lit(seg), i), 1), 10, 36)))
        }
        base0.withColumn("text", concat_ws(" ", col("text") +: pads: _*))
      }
    val corpus =
      if (mult <= 1) {
        base.select(col("source").as("repo"),
          concat(lit("doc/"), col("doc_id")).as("path"), lit("v0").as("commit"),
          col("lang"), col("text").as("content"))
      } else {
        val rep = base.select(col("doc_id"), col("source"), col("lang"), col("text"),
          explode(sequence(lit(0), lit(mult - 1))).as("rep"))
        val content =
          if (dupMode == "clique") concat(col("text"), lit(" rep"), col("rep"))
          else {
            // unique junk: one base36 token per original token (sign-safe
            // shift, not abs — see the lenMult pad above)
            val ntok = size(split(col("text"), "\\s+"))
            val junk = transform(sequence(lit(1), ntok),
              i => conv(shiftrightunsigned(xxhash64(col("doc_id"), col("rep"), i), 1), 10, 36))
            val nonDup =
              if (dupMode == "interleave")
                // token-wise interleave: breaks every shingle and run
                concat_ws(" ", flatten(zip_with(split(col("text"), "\\s+"), junk,
                  (a, b) => array(a, b))))
              else concat_ws(" ", col("text"), concat_ws(" ", junk))
            when(col("rep") === 0, col("text"))
              .when(pmod(col("rep"), lit(5)) === 1, concat(col("text"), lit(" nd"), col("rep")))
              .otherwise(nonDup)
          }
        rep.select(
          concat(col("source"), lit("_"), col("rep")).as("repo"),
          concat(lit("doc/"), col("doc_id"), lit("/"), col("rep")).as("path"),
          lit("v0").as("commit"), col("lang"),
          content.as("content"))
      }
    corpus
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "1").toInt
    val lenMult = sys.env.getOrElse("SPARK_GRAFT_LENMULT", "1").toInt
    // SPARK_GRAFT_MASTER overrides the single-JVM default — used by the
    // scaling protocol to run the SAME job on a multi-executor-JVM
    // local-cluster[workers,coresPerWorker,memMB] (separate executor
    // processes with real serialization + IPC boundaries on this box;
    // needs SPARK_HOME=/opt/spark so the standalone Worker can fork them).
    // SPARK_GRAFT_CPUS stays the TOTAL core count (= shuffle partitions).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // SPARK_GRAFT_SHUFFLE_PARTS decouples exchange sizing from core count
    // (default: = cores). At content-weighted shapes the suffix gram
    // exchange is ~50× a core-count partitioning's sort budget and
    // spills; 2–4× cores is the standard practice a real deployment runs.
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // forked executors need the app classes (no spark-submit jar here)
      val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
      builder
        .config("spark.executor.extraClassPath", classes)
        .config("spark.executor.memory", sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The source is one small parquet file → one input partition; without
    // an explicit repartition every narrow stage (including the signature
    // kernel) would run as a single task regardless of cores.
    val cores = cpus.toInt
    val dupMode = sys.env.getOrElse("SPARK_GRAFT_DUPMODE", "mixed")
    val t1 = benchT1(spark, sfDir, mult, dupMode, lenMult).repartition(cores * 2).persist()
    val nDocs = t1.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // Headline e2e on the (optionally inflated) corpus, then EVERY
    // SparkEntry.queries entry — a regression anywhere in the surface shows
    // up in the per-query map, not just in the curated subset.
    // SPARK_GRAFT_BENCH_ONLY=name1,name2 restricts to a subset (used by the
    // interleaved scaling-efficiency protocol to time just the e2e run).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val headline: Seq[(String, () => Long)] =
      (Seq[(String, () => Long)](
        "dedup_end_to_end" -> (() => {
          val res = DedupPipeline.run(spark, t1, conf.DedupConfig.default)
          val n = res.clusters.count()
          res.release() // don't pin the pair caches across the other queries
          n
        }),
        "dedup_kernel_only" -> (() =>
          DedupPipeline.signatures(spark, t1, conf.DedupConfig.default).count()),
        // shared-build attribution: the memoized pipeline/incremental-state
        // builds are timed as their OWN entries so the stage queries below
        // measure only their own work (not a cost-shifted rebuild)
        "pipeline_build" -> (() => SparkEntry.prewarmPipeline(spark, sfDir)),
        "incr_build" -> (() => SparkEntry.prewarmIncremental(spark, sfDir))
      ) ++ SparkEntry.queries.keys.toSeq.sorted.map { name =>
        name -> (() => SparkEntry.queries(name)(spark, sfDir).count())
      }).filter { case (n, _) => only.forall(_.contains(n)) }

    val results = headline.map { case (name, f) =>
      val (sec, _) = try time(f()) catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); (-1.0, -1L)
      }
      name -> sec
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val e2e = results.toMap.getOrElse("dedup_end_to_end", -1.0)
    val fps = if (e2e > 0) nDocs / e2e else -1.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"mult":$mult,"len_mult":$lenMult,"dup_mode":"$dupMode","n_docs":$nDocs,"files_per_sec":$fps}"""
    // stdout goes through sbt's logger (prefixed "[info] "), which broke the
    // driver's JSON parse in round 1 — the file is the canonical output.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")), json)
    println(json)
    spark.stop()
  }
}
