package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.suffix.{SuffixArrays, SuffixPass}

/** Grams-vs-winnow A/B for the suffix index (test scope, not shipped) —
  * the measured profile behind the `SuffixPass.winnow` sampling option
  * (round-4 VERDICT stretch #8): the default gram index costs ~1 row per
  * TOKEN (every position's 50-gram); winnowing with k-gram k = minLen/2
  * and window w = minLen−k+1 keeps the ≥minLen detection guarantee
  * (Schleimer et al. '03: any shared run ≥ w+k−1 = minLen shares a
  * selected fingerprint — SuffixArraySpec proves it on this kernel) at an
  * expected density of 2/(w+1) rows per token, ~13× smaller.
  *
  * The trade (documented in SuffixPass's scaladoc) is CAP PRECISION, not
  * recall: the df-cap must act on boilerplate gram frequency, and
  * winnowed selection is context-dependent — a boilerplate run selected
  * by few docs leaks past a fingerprint-level cap; shorter k also admits
  * candidates sharing only ≥k (not ≥minLen) tokens, which the exact
  * verifier then rejects (more verify work). Both paths here share one
  * simplified candidate gen + the exact `commonRunAtLeast` verifier, so
  * the printed numbers isolate exactly index size / candidate mass /
  * verified recall.
  *
  * Env: P_CPUS (16), P_MULT (5), P_LENMULT (32), P_DUPMODE (mixed —
  * shared padded bodies make real containment families).
  */
object ProfWinnow {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = graft.conf.DedupConfig.default
    val minLen = cfg.suffixMinLen
    val k = math.max(4, minLen / 2)
    val w = minLen - k + 1

    val mult = sys.env.getOrElse("P_MULT", "5").toInt
    val lenMult = sys.env.getOrElse("P_LENMULT", "32").toInt
    val dupMode = sys.env.getOrElse("P_DUPMODE", "mixed")
    val t1 = graft.Bench.benchT1(spark, "/root/testdata/sf0.1", mult, dupMode, lenMult)
      .repartition(cpus.toInt * 2)
    val t1d = graft.DedupPipeline.distinctByContent(t1)
    val toks = SuffixPass.tokenDocs(spark, t1d, cfg)
      .filter(_.tokens.length >= minLen).persist()
    val nDocs = toks.count()
    val nTokens = toks.map(_.tokens.length.toLong).reduce(_ + _)
    println(s"docs=$nDocs tokens=$nTokens (mult=$mult lenMult=$lenMult $dupMode; k=$k w=$w)")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$name] ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // shared candidate gen + exact verify over an (fp, doc_id) index —
    // identical machinery both ways, so the A/B isolates the index itself
    def run(mode: String, fps: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val idx = fps.persist()
      val rows = time(s"$mode index")(idx.count())
      println(f"  $mode%-6s index rows=$rows%,d (${rows.toDouble / nTokens}%.3f rows/token, ~${rows * 16 / 1e6}%.0f MB)")
      val keep = idx.groupBy("fp").agg(count(lit(1)).as("df"))
        .where(col("df") >= 2 && col("df") <= cfg.suffixDfMax).select("fp")
      val cands = idx.join(keep, "fp")
      val pairs = cands.as("x").join(cands.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().persist()
      val nPairs = time(s"$mode cands")(pairs.count())
      val ta = toks.toDF().select(col("doc_id").as("a"), col("tokens").as("tka"))
      val tb = toks.toDF().select(col("doc_id").as("b"), col("tokens").as("tkb"))
      val verified = time(s"$mode verify")(
        pairs.join(ta, "a").join(tb, "b")
          .select(col("a"), col("b"), col("tka"), col("tkb"))
          .as[(Long, Long, Array[Long], Array[Long])]
          .mapPartitions(_.flatMap { case (a, b, x, y) =>
            if (SuffixArrays.commonRunAtLeast(x, y, minLen) >= minLen) Some((a, b)) else None
          }).collect().toSet)
      println(s"  $mode candidates=$nPairs verified=${verified.size}")
      idx.unpersist(false); pairs.unpersist(false)
      verified
    }

    val gram = run("grams",
      toks.flatMap(d => SuffixPass.grams(d.tokens, minLen).map(fp => (fp, d.doc_id)))
        .toDF("fp", "doc_id"))
    val win = run("winnow",
      toks.flatMap(d => SuffixPass.winnow(d.tokens, k, w).map(fp => (fp, d.doc_id)))
        .toDF("fp", "doc_id"))

    val recall = if (gram.isEmpty) 1.0 else gram.intersect(win).size.toDouble / gram.size
    println(f"winnow verified-pair recall vs gram path: $recall%.4f " +
      s"(gram=${gram.size} winnow=${win.size} winnow-only=${(win -- gram).size})")
    spark.stop()
  }
}
