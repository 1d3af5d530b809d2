package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for stage hot spots (test scope, not shipped). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("P_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("P_CPUS", "32"))
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
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[${sys.env.getOrElse("P_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("P_CPUS", "32"))
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

// appended: e2e stage-level profiler with a SparkListener
object ProfE2E {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val m = si.taskMetrics
        val det = f"cpu=${m.executorCpuTime / 1e9}%.0f s run=${m.executorRunTime / 1e3}%.0f s " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0f MB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0f MB " +
          f"spill=${m.diskBytesSpilled / 1e6}%.0f MB gc=${m.jvmGCTime / 1e3}%.0f s"
        stages.put(si.stageId, (si.name.split("\n").head.take(60) + "  " + det, dur, si.numTasks.toLong))
      }
    })
    val mult = sys.env.getOrElse("P_MULT", "20").toInt
    val dupMode = sys.env.getOrElse("P_DUPMODE", "mixed")
    val lenMult = sys.env.getOrElse("P_LENMULT", "1").toInt
    val t1 = graft.Bench.benchT1(spark, "/root/testdata/sf0.1", mult, dupMode, lenMult)
      .repartition(cpus.toInt * 2).persist()
    println(s"docs=${t1.count()}")
    val t0 = System.nanoTime()
    val n = graft.DedupPipeline.run(spark, t1, graft.conf.DedupConfig.default).clusters.count()
    println(f"e2e: ${(System.nanoTime() - t0) / 1e9}%.1f s clusters=$n")
    import scala.jdk.CollectionConverters._
    val top = stages.asScala.toSeq.sortBy(-_._2._2).take(15)
    top.foreach { case (id, (name, dur, tasks)) => println(f"stage $id%4d ${dur / 1000.0}%7.1f s tasks=$tasks%4d  $name") }
    spark.stop()
  }
}

// appended: per-phase e2e decomposition (+ shuffle-bytes per phase — the
// bandwidth evidence behind BASELINE.md's single-box scaling ceiling)
object ProfPhases {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "32")
    var b = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
    sys.env.getOrElse("P_EXTRA", "").split(',').filter(_.contains('=')).foreach { kv =>
      val Array(k, v) = kv.split('=') ; b = b.config(k, v)
    }
    val spark = b
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = graft.conf.DedupConfig.default
    import org.apache.spark.sql.functions._
    val prof0 = System.currentTimeMillis()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    def time[T](name: String)(f: => T): T = {
      val (w0, r0, c0) = (shufWrite.get, shufRead.get, cpuNs.get)
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give them a beat
      Thread.sleep(300)
      println(f"phase $name: $wall%.1f s  [t=${(System.currentTimeMillis() - prof0) / 1e3}%.0f] shufW=${(shufWrite.get - w0) / 1e6}%.0f MB shufR=${(shufRead.get - r0) / 1e6}%.0f MB cpu=${(cpuNs.get - c0) / 1e9}%.1f s")
      r
    }
    // top-stage dump (same detail as ProfE2E) to catch work that lands in
    // the wrong phase window via AQE's async stage materialization
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val m = si.taskMetrics
        val det = f"sub=${(si.submissionTime.getOrElse(0L) - prof0) / 1e3}%.0f done=${(si.completionTime.getOrElse(0L) - prof0) / 1e3}%.0f " +
          f"cpu=${m.executorCpuTime / 1e9}%.0f s " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0f MB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0f MB " +
          f"spill=${m.diskBytesSpilled / 1e6}%.0f MB gc=${m.jvmGCTime / 1e3}%.0f s"
        stages.put(si.stageId, (f"${si.name.split("\n").head.take(40)}  $det", dur))
      }
    })
    val mult = sys.env.getOrElse("P_MULT", "20").toInt
    val dupMode = sys.env.getOrElse("SPARK_GRAFT_DUPMODE", "mixed")
    val lenMult = sys.env.getOrElse("P_LENMULT", "1").toInt
    val t1 = graft.Bench.benchT1(spark, "/root/testdata/sf0.1", mult, dupMode, lenMult)
      .repartition(cpus.toInt * 2).persist()
    println(s"docs=${t1.count()}")
    val t1d = time("t1_distinct")(graft.DedupPipeline.distinctByContent(t1).persist())
    time("t1d count")(println(t1d.count()))
    val sigs = graft.DedupPipeline.signatures(spark, t1d, cfg).persist()
    time("signatures")(println(sigs.count()))
    val bands = graft.lsh.Banding.bandRows(sigs, cfg).persist()
    time("bands")(println(bands.count()))
    val (lshPairs, _) = graft.lsh.CandidatePairs.generateJoin(spark, bands, cfg)
    val lp = lshPairs.persist()
    time("lsh_pairs_join")(println(lp.count()))
    val sfx = graft.suffix.SuffixPass.containmentPairs(spark, t1d, cfg).persist()
    time("suffix")(println(sfx.count()))
    val ver = graft.verify.Verifier.verifyLshPairs(lp, sigs, cfg).persist()
    time("verify")(println(ver.count()))
    val edges = ver.select("a", "b").unionByName(sfx.select("a", "b")).distinct().persist()
    time("edges")(println(edges.count()))
    time("cc")(println(graft.cc.ConnectedComponents.run(spark, edges).count()))
    locally {
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._2).take(10).foreach { case (id, (name, dur)) =>
        println(f"stage $id%4d ${dur / 1000.0}%7.1f s  $name")
      }
    }
    spark.stop()
  }
}

// appended: A/B the pair self-join physical strategy (SMJ vs shuffled hash)
// on the slim 3-long rows; salting bounds per-key groups so a hash build is
// bounded per partition, but SMJ+AQE won round 1 — re-test post-diet.
object ProfPairsAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val cfg = graft.conf.DedupConfig.default
    val mult = sys.env.getOrElse("P_MULT", "100").toInt
    val t1 = graft.Bench.benchT1(spark, "/root/testdata/sf0.1", mult)
      .repartition(cpus.toInt * 2).persist()
    println(s"docs=${t1.count()}")
    val t1d = graft.DedupPipeline.distinctByContent(t1).persist()
    val sigs = graft.DedupPipeline.signatures(spark, t1d, cfg).persist()
    sigs.count()
    val bands = graft.lsh.Banding.bandRows(sigs, cfg).persist()
    bands.count()
    def run(name: String, hint: String): Unit = {
      val counts = bands.groupBy("band", "band_hash").agg(count(lit(1)).as("cnt"))
      val stop = counts.where(col("cnt") > cfg.stopBandSize)
      val hot = counts.where(col("cnt") > cfg.maxBandSize && col("cnt") <= cfg.stopBandSize)
        .select(col("band"), col("band_hash"),
          ceil(col("cnt") / cfg.maxBandSize.toDouble).cast("int").as("s"))
      val salted = bands
        .join(broadcast(stop.select("band", "band_hash")), Seq("band", "band_hash"), "left_anti")
        .join(broadcast(hot), Seq("band", "band_hash"), "left")
        .na.fill(Map("s" -> 1))
        .withColumn("salt", pmod(xxhash64(col("doc_id")), col("s")).cast("int"))
      val exploded = salted
        .select(col("band"), col("band_hash"), col("doc_id"), col("salt"),
          explode(transform(sequence(lit(0), col("s") - 1),
            x => struct(least(x, col("salt")).as("i"), greatest(x, col("salt")).as("j")))).as("bp"))
        .select(col("band_hash").as("bh"),
          (col("band").cast("long") + shiftleft(col("bp.i").cast("long"), 8)
            + shiftleft(col("bp.j").cast("long"), 36)).as("pk"),
          col("doc_id"), col("salt"), col("bp.i").as("i"), col("bp.j").as("j"))
      val l0 = exploded.where(col("salt") === col("i"))
        .select(col("bh"), col("pk"), col("doc_id").as("dl"))
      val l = if (hint.nonEmpty) l0.hint(hint) else l0
      val r = exploded.where(col("salt") === col("j"))
        .select(col("bh").as("bh_r"), col("pk").as("pk_r"), col("doc_id").as("dr"))
      val iOf = shiftrightunsigned(col("pk"), 8).bitwiseAND(lit((1L << 28) - 1))
      val jOf = shiftrightunsigned(col("pk"), 36)
      val pairs = l.join(r,
        col("bh") === col("bh_r") && col("pk") === col("pk_r") &&
          (iOf =!= jOf || col("dl") < col("dr")) && col("dl") =!= col("dr"))
        .select(least(col("dl"), col("dr")).as("a"), greatest(col("dl"), col("dr")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("m"))
      val t0 = System.nanoTime()
      val n = pairs.count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s pairs=$n")
    }
    for (rep <- 1 to 3; (name, hint) <- Seq("smj" -> "", "shj" -> "shuffle_hash"))
      run(s"$name rep$rep", hint)
    spark.stop()
  }
}

// appended: write an inflated corpus parquet for staged-CLI benchmarks
object WriteCorpus {
  def main(args: Array[String]): Unit = {
    val Array(out) = args.take(1)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mult = sys.env.getOrElse("P_MULT", "100").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_DUPMODE", "clique")
    graft.Bench.benchT1(spark, "/root/testdata/sf0.1", mult, mode)
      .select("repo", "path", "commit", "lang", "content")
      .write.mode("overwrite").parquet(out)
    println(s"written ${spark.read.parquet(out).count()} rows to $out")
    spark.stop()
  }
}

// appended: plan inspection for pushdown/broadcast evidence
object ProfPlans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"########## $name")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    show("q_filter_pushdown", graft.SparkEntry.queries("q_filter_pushdown")(spark, d))
    show("q_join_agg", graft.SparkEntry.queries("q_join_agg")(spark, d))
    show("q_topk", graft.SparkEntry.queries("q_topk")(spark, d))
    show("q_join5_region", graft.SparkEntry.queries("q_join5_region")(spark, d))
    // verify path: slim parity prune feeding the fat array join
    val cfg = graft.conf.DedupConfig.default
    val t1 = graft.ingest.Ingest.ingest(graft.ingest.Ingest.corpusFromDocuments(spark, d))
    val sigs = graft.DedupPipeline.signatures(spark, t1, cfg)
    val bands = graft.lsh.Banding.bandRows(sigs, cfg)
    val (pairs, _) = graft.lsh.CandidatePairs.generateJoin(spark, bands, cfg)
    show("pair_gen_slim_join", pairs)
    show("verify_two_phase", graft.verify.Verifier.verifyLshPairs(pairs, sigs, cfg))
    // pair collapse must stay a HashAggregate over the int priority — a
    // min(string) collapse plans a SortAggregate that double-sorts every
    // pair table (PlanSpec asserts; this dump is the human-readable twin)
    val exact = graft.lsh.CandidatePairs.exactPairs(t1)
    show("pair_collapse_strongest",
      graft.lsh.CandidatePairs.strongest(pairs.unionByName(exact)))
    show("dedup_jaccard_sql", graft.SparkEntry.queries("dedup_jaccard_sql")(spark, d))
    // suffix pass: the candidate subtree feeds both the endpoint prune and
    // the verify join — the duplicated gram shuffle must collapse at
    // runtime (AQE stage reuse; the static plan can't show it, so dump the
    // EXECUTED adaptive plan and look for ReusedQueryStage/ReusedExchange)
    val sfxDf = graft.suffix.SuffixPass.containmentPairs(spark,
      graft.DedupPipeline.distinctByContent(t1), cfg)
    show("suffix_containment", sfxDf)
    sfxDf.count()
    println("########## suffix_containment EXECUTED (adaptive)")
    println(sfxDf.queryExecution.executedPlan.toString)
    // train-prep: split is one codegen projection (no exchange); shard
    // packing must show the pid-partitioned prefix window + the broadcast
    // offsets join, NOT a global-order window (TrainPrepSpec guards)
    show("train_split", graft.SparkEntry.queries("train_split")(spark, d))
    show("pack_shards", graft.SparkEntry.queries("pack_shards")(spark, d))
    show("shard_stats", graft.SparkEntry.queries("shard_stats")(spark, d))
    show("sample_stratified",
      graft.SparkEntry.queries("sample_stratified")(spark, d))
    spark.stop()
  }
}
