package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("P_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("P_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.conf.DedupConfig.default

    val np = sys.env.getOrElse("P_CPUS", "32").toInt * 2
    val t1 = spark.read.parquet("/tmp/dedup_prof/t1").repartition(np)
    val bands = spark.read.parquet("/tmp/dedup_prof/bands").repartition(np)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }

    time("lsh pair gen") {
      graft.lsh.CandidatePairs.generate(spark, bands, cfg)._1.count()
    }
    time("exact pairs") {
      graft.lsh.CandidatePairs.exactPairs(t1).count()
    }
    time("suffix tokens only") {
      graft.suffix.SuffixPass.tokenDocs(spark, t1, cfg).count()
    }
    time("suffix full") {
      graft.suffix.SuffixPass.containmentPairs(spark, t1, cfg).count()
    }
    spark.stop()
  }
}
