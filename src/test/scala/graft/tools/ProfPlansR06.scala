package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Round-6 deliverable helper: dump `.explain("formatted")` for every query
  * the optimization round touched, as `plans/r06/<name>_<P_TAG>.txt`
  * (P_TAG=before from the pre-round tree, =after from the current one).
  */
object ProfPlansR06 {
  def main(args: Array[String]): Unit = {
    val outDir = sys.env.getOrElse("P_OUT", "plans/r06")
    val tag = sys.env.getOrElse("P_TAG", "after")
    Files.createDirectories(Paths.get(outDir))
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def dump(name: String, df: DataFrame): Unit = {
      val s = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$tag.txt"), s.getBytes("UTF-8"))
      println(s"dumped $name")
    }
    Seq("dedup_clusters", "dedup_cluster_stats", "dedup_candidate_pairs",
      "first_stories", "incr_clusters", "incr_cluster_stats",
      "pack_shards", "shard_stats", "sample_stratified", "ann_topk_ivf",
      "ann_ivf_recall").foreach { q =>
      dump(q, graft.SparkEntry.queries(q)(spark, d))
    }
    // dedup_end_to_end is a bench entry, not a queries entry: dump the
    // clusters tree of DedupPipeline.run over the bench corpus
    val cfg = graft.conf.DedupConfig.default
    val t1 = graft.Bench.benchT1(spark, d, 1).repartition(8).persist()
    val res = graft.DedupPipeline.run(spark, t1, cfg)
    dump("dedup_end_to_end", res.clusters)
    dump("suffix_containment", graft.suffix.SuffixPass.containmentPairs(
      spark, graft.DedupPipeline.distinctByContent(t1), cfg))
    res.release()
    spark.stop()
  }
}
