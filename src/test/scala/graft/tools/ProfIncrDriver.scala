package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalDedup

/** Profiler for the DRIVER-path incremental build (test scope, not
  * shipped): replicates SparkEntry.incrState exactly — four doc_id%4
  * slices through processBatch(collectStats = false) with a compactState
  * after the third — and prints per-call wall plus Spark JOB count and
  * summed job time, so the fixed per-batch floor is attributable to
  * scheduling (many short jobs) vs compute (few long ones).
  *
  * Env: P_CPUS (default 32), P_SF (default /root/testdata/sf0.1).
  */
object ProfIncrDriver {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.ui.enabled", "false")
    sys.env.get("P_EXTRA").foreach(_.split(',').filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.conf.DedupConfig.default
    val sfDir = sys.env.getOrElse("P_SF", "/root/testdata/sf0.1")

    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        val s = starts.remove(j.jobId)
        if (s != 0L) jobNanos.addAndGet(System.nanoTime() - s)
        ()
      }
    })

    val dir = java.nio.file.Files.createTempDirectory("graft-prof-incr-driver").toString
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    def slice(i: Int) =
      graft.ingest.Ingest.documentsToCorpus(base.where(pmod(col("doc_id"), lit(4)) === i))
        .repartition(spark.sparkContext.defaultParallelism)

    def step(name: String)(f: => Unit): Unit = {
      jobs.set(0L); jobNanos.set(0L)
      val t0 = System.nanoTime()
      f
      org.apache.spark.GraftTestBridge.waitListenerBus(spark.sparkContext)
      println(f"$name%-12s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"jobs=${jobs.get()}%3d jobTimeSum=${jobNanos.get() / 1e9}%6.2f s")
    }

    step("batch0") { IncrementalDedup.processBatch(spark, slice(0), dir, cfg, collectStats = false); () }
    step("batch1") { IncrementalDedup.processBatch(spark, slice(1), dir, cfg, collectStats = false); () }
    step("batch2") { IncrementalDedup.processBatch(spark, slice(2), dir, cfg, collectStats = false); () }
    step("compact") { IncrementalDedup.compactState(spark, dir) }
    step("batch3") { IncrementalDedup.processBatch(spark, slice(3), dir, cfg, collectStats = false); () }
    spark.stop()
  }
}
