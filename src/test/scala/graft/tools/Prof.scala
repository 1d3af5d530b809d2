package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for stage hot spots (test scope, not shipped). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.conf.DedupConfig.default

    val pairs = spark.read.parquet("/tmp/dedup_prof/candidate_pairs")
      .where(col("src").isin("minhash", "simhash"))
    val sigs = spark.read.parquet("/tmp/dedup_prof/signatures")
    println(s"pairs=${pairs.count()} sigs=${sigs.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }

    time("joins only") {
      val sa = sigs.select(col("doc_id").as("a"), col("minhash").as("mh_a"), col("simhash").as("sh_a"))
      val sb = sigs.select(col("doc_id").as("b"), col("minhash").as("mh_b"), col("simhash").as("sh_b"))
      pairs.join(sa, "a").join(sb, "b").count()
    }
    time("full verify") {
      graft.verify.Verifier.verifyLshPairs(pairs, sigs, cfg).count()
    }
    val v = graft.verify.Verifier.verifyLshPairs(pairs, sigs, cfg)
    v.explain("formatted")
    spark.stop()
  }
}
// appended: CC-focused profiler
object ProfCC {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.read.parquet("/tmp/dedup_prof2/verified_pairs").select("a", "b")
    println(s"edges=${edges.count()}")
    val t0 = System.nanoTime()
    val m = graft.cc.ConnectedComponents.run(spark, edges)
    println(s"mapped=${m.count()} in ${(System.nanoTime() - t0) / 1e9}%s s")
    spark.stop()
  }
}
