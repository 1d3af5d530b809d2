package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalDedup

/** Incremental-mode profiler (test scope, not shipped): feeds the bench
  * corpus through processBatch in K equal batches and reports per-batch
  * wall, shuffle-read bytes, emitted pairs and cumulative docs — the
  * numbers that show whether per-batch cost tracks the BATCH (probe-side
  * prunes working) or the accumulated corpus. Optionally compacts
  * mid-stream and cross-checks final clusters against the batch pipeline.
  *
  * Env: P_CPUS (default 16), P_MULT (corpus inflation, default 20),
  * P_BATCHES (default 8), P_SF (default /root/testdata/sf0.1),
  * P_COMPACT_EVERY (0 = never), P_CHECK (1 = compare cluster histogram
  * with the batch pipeline at the end).
  */
object ProfIncr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.conf.DedupConfig.default
    val sfDir = sys.env.getOrElse("P_SF", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("P_MULT", "20").toInt
    val k = sys.env.getOrElse("P_BATCHES", "8").toInt
    val compactEvery = sys.env.getOrElse("P_COMPACT_EVERY", "0").toInt

    val workRoot = java.nio.file.Files.createTempDirectory("graft-prof-incr").toString
    val stateDir = s"$workRoot/state"

    // deterministic near-equal split by path hash; each batch written to its
    // own parquet dir so per-batch reads are concrete scans (like a stream)
    val corpus = graft.Bench.benchCorpus(spark, sfDir, mult)
      .withColumn("bno", pmod(xxhash64(col("path")), lit(k)).cast("int"))
    corpus.write.partitionBy("bno").mode("overwrite").parquet(s"$workRoot/in")
    val total = spark.read.parquet(s"$workRoot/in").count()
    println(s"corpus=$total docs, $k batches, cpus=$cpus mult=$mult")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        ()
      }
    })

    (0 until k).foreach { b =>
      val batch = spark.read.parquet(s"$workRoot/in/bno=$b")
        .select("repo", "path", "commit", "lang", "content")
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val r = IncrementalDedup.processBatch(spark, batch, stateDir, cfg)
      org.apache.spark.GraftTestBridge.waitListenerBus(spark.sparkContext)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"batch $b%2d: wall=$wall%6.1f s shuffleRead=${shuffleBytes.get() / 1e6}%8.1f MB " +
        f"newPairs=${r.newPairs}%8d newSfx=${r.newSuffixPairs}%6d totalDocs=${r.totalDocs}%9d")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0 && b + 1 < k) {
        val c0 = System.nanoTime()
        IncrementalDedup.compactState(spark, stateDir)
        println(f"  compact after batch $b%d: ${(System.nanoTime() - c0) / 1e9}%.1f s")
      }
    }

    val t0 = System.nanoTime()
    val clusters = IncrementalDedup.clusters(spark, stateDir, cfg)
    val nClustered = clusters.groupBy("cluster_id").count().where(col("count") > 1).count()
    println(f"final clusters(): ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"multi-doc clusters=$nClustered")

    if (sys.env.get("P_CHECK").contains("1")) {
      val t1 = graft.Bench.benchT1(spark, sfDir, mult).repartition(cpus.toInt * 2)
      val bres = graft.DedupPipeline.run(spark, t1, cfg)
      val bHist = bres.clusters.groupBy("cluster_id").count()
        .groupBy("count").count().orderBy("count")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val iHist = clusters.groupBy("cluster_id").count()
        .groupBy("count").count().orderBy("count")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      println(s"batch   cluster-size histogram: $bHist")
      println(s"incr    cluster-size histogram: $iHist")
      println(if (bHist == iHist) "HISTOGRAMS MATCH" else "HISTOGRAM MISMATCH")
    }
    spark.stop()
  }
}
