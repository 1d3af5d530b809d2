package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.IncrementalDedup
import graft.testutil.FixtureGen

/** Scratch: replicate StreamingSpec's shuffle-flatness scenario and print
  * per-stage shuffle-read bytes per batch, so a regression in per-batch
  * shuffle volume is attributable to a specific stage. Not shipped.
  */
object ProfShuffleFlat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties).flatMap(p => Option(p.getProperty("spark.sql.execution.root.id")).orElse(Option(p.getProperty("spark.sql.execution.id")))).getOrElse("?") + ":" + Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        j.stageIds.foreach(sid => stageJob.put(sid, s"job${j.jobId}:$desc"))
        ()
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null && m.shuffleReadMetrics.totalBytesRead > 0)
          stages.add((sc.stageInfo.stageId,
            stageJob.getOrDefault(sc.stageInfo.stageId, "?"),
            m.shuffleReadMetrics.totalBytesRead))
        ()
      }
    })
    val corpus = FixtureGen.corpus(600, 11L)
    val parts = corpus.grouped((corpus.size + 3) / 4).toSeq
    val stateDir = java.nio.file.Files.createTempDirectory("graft-profshuffle").toString
    def df(chunk: Seq[graft.model.CorpusRow]) =
      spark.createDataFrame(chunk).select("repo", "path", "commit", "lang", "content")
    parts.zipWithIndex.foreach { case (chunk, i) =>
      stages.clear()
      IncrementalDedup.processBatch(spark, df(chunk), stateDir, graft.conf.DedupConfig.default)
      org.apache.spark.GraftTestBridge.waitListenerBus(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      println(f"=== batch $i total=${ss.map(_._3).sum}%,d bytes over ${ss.size} stages")
      ss.sortBy(-_._3).take(24).foreach { case (id, n, b) =>
        println(f"  $b%,12d  [$id%4d] $n")
      }
    }
    spark.stop()
  }
}
