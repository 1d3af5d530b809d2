package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.conf.DedupConfig
import graft.streaming.IncrementalDedup
import graft.testutil.FixtureGen

/** Incremental mode must converge to the batch pipeline's answer: feeding
  * the corpus in K batches yields the same verified LSH+exact pair set and
  * the same clusters as one batch run (suffix pass excluded — it is
  * documented as periodic-full-only).
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val cfg = DedupConfig.default
  private lazy val corpus = FixtureGen.corpus(600, 11L)

  test("3 incremental batches == one batch run (pairs and clusters)") {
    val stateDir = Files.createTempDirectory("graft-stream").toString
    val parts = corpus.grouped((corpus.size + 2) / 3).toSeq
    parts.foreach { chunk =>
      IncrementalDedup.processBatch(spark,
        spark.createDataFrame(chunk).select("repo", "path", "commit", "lang", "content"),
        stateDir, cfg)
    }

    // append-only state: each micro-batch wrote ONLY its own partition —
    // per-batch write volume ∝ batch size, never O(corpus-so-far)
    val docsByBatch = spark.read.parquet(s"$stateDir/docs")
      .groupBy("batch").count().as[(Long, Long)].collect().toMap
    assert(docsByBatch.keySet === Set(0L, 1L, 2L))
    parts.zipWithIndex.foreach { case (chunk, i) =>
      assert(docsByBatch(i.toLong) === chunk.size.toLong, s"batch $i rewrote state")
    }
    val bandsByBatch = spark.read.parquet(s"$stateDir/bands")
      .groupBy("batch").count().as[(Long, Long)].collect().toMap
    parts.zipWithIndex.foreach { case (chunk, i) =>
      assert(bandsByBatch(i.toLong) <= chunk.size.toLong * (cfg.bands + cfg.simhashBlocks),
        s"batch $i band partition larger than its own docs' bands")
    }

    // replaying a committed batch id is a no-op (exactly-once marker)
    val before = new io.ParquetCatalog(stateDir).read(spark, "pairs").count()
    val replay = IncrementalDedup.processBatch(spark,
      spark.createDataFrame(parts.head).select("repo", "path", "commit", "lang", "content"),
      stateDir, cfg, batchId = 0L)
    assert(replay.newPairs === 0L)
    assert(new io.ParquetCatalog(stateDir).read(spark, "pairs").count() === before)

    // re-ingesting known docs under a FRESH batch id is also a no-op for
    // state rows (anti-join on doc_id): no duplicate bands/docs appear
    IncrementalDedup.processBatch(spark,
      spark.createDataFrame(parts.head).select("repo", "path", "commit", "lang", "content"),
      stateDir, cfg)
    val docsAfter = spark.read.parquet(s"$stateDir/docs").count()
    assert(docsAfter === corpus.size.toLong, "re-ingest duplicated doc state")

    val t1 = ingest.Ingest.ingest(
      spark.createDataFrame(corpus).select("repo", "path", "commit", "lang", "content"))
    val batch = DedupPipeline.run(spark, t1, cfg, withSuffixPass = true)

    // The batch pipeline runs LSH over sha-distinct reps only; incremental
    // mode bands every doc, so its LSH/exact edge set is a superset
    // (member-level pairs are implied by exact edges). Suffix pairs are
    // rep-level on BOTH sides but the two pick reps differently (global min
    // doc_id vs first arrival), so suffix coverage is asserted through the
    // exact cluster equality below — including the retroactive df-cap
    // (boilerplate grams whose carriers arrived spread over batches).
    val incPairs = IncrementalDedup.edges(spark, stateDir, cfg)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val batchPairs = batch.verifiedPairs.where($"src" =!= "suffix")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert((batchPairs -- incPairs).isEmpty,
      s"incremental missing pairs: ${(batchPairs -- incPairs).take(5)}")

    val incClusters = IncrementalDedup.clusters(spark, stateDir, cfg)
      .as[(Long, Long)].collect().toMap
    val batchClusters = batch.clusters.as[(Long, Long)].collect().toMap
    assert(incClusters === batchClusters)
  }

  test("incremental suffix pass: containment found across batches; retroactive df-cap") {
    // doc 0 (batch A) is contained verbatim in doc 1 (batch B) — the pair
    // must be found even though the endpoints arrive in different batches.
    // Docs 100.. share a 60-token boilerplate header; the header's gram df
    // crosses suffixDfMax only once batch B lands, so the header pairs
    // emitted while batch A was under the cap must be RETROACTIVELY dead in
    // the composed edge set (exact batch semantics), while the containment
    // pair (whose grams stay rare) survives.
    def tok(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val contained = tok("inner", 60)
    val big = tok("pre", 200) + " " + contained + " " + tok("post", 200)
    val header = tok("hdr", 60)
    val scfg = cfg.copy(suffixDfMax = 8)
    def boiler(i: Int) =
      graft.model.CorpusRow("rb", s"b/$i", "c", "en", header + " " + tok(s"tail${i}_", 150))
    val batchA = Seq(graft.model.CorpusRow("r", "p/0", "c", "en", contained)) ++
      (100 until 106).map(boiler) // 6 header carriers: under cap
    val batchB = Seq(graft.model.CorpusRow("r", "p/1", "c", "en", big)) ++
      (106 until 112).map(boiler) // 12 total: over cap=8 → retroactively dead

    val stateDir = Files.createTempDirectory("graft-stream-sfx").toString
    def df(rows: Seq[graft.model.CorpusRow]) =
      spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")
    val rA = IncrementalDedup.processBatch(spark, df(batchA), stateDir, scfg)
    assert(rA.newSuffixPairs > 0, "under-cap header pairs should be emitted in batch A")
    IncrementalDedup.processBatch(spark, df(batchB), stateDir, scfg)

    val ids = ingest.Ingest.ingest(df(batchA ++ batchB))
      .select($"path", $"doc_id").as[(String, Long)].collect().toMap
    val live = IncrementalDedup.edges(spark, stateDir, scfg)
      .as[(Long, Long)].collect().toSet
      .map { p: (Long, Long) => (math.min(p._1, p._2), math.max(p._1, p._2)) }
    val cPair = (math.min(ids("p/0"), ids("p/1")), math.max(ids("p/0"), ids("p/1")))
    assert(live.contains(cPair), "cross-batch containment pair missing")
    val boilerIds = (100 until 112).map(i => ids(s"b/$i")).toSet
    assert(!live.exists(p => boilerIds(p._1) && boilerIds(p._2)),
      "boilerplate header pairs must be retroactively dead once df > cap")

    // and the batch pipeline agrees end-to-end on this corpus
    val batchClusters = DedupPipeline.run(spark,
        ingest.Ingest.ingest(df(batchA ++ batchB)), scfg)
      .clusters.as[(Long, Long)].collect().toMap
    val incClusters = IncrementalDedup.clusters(spark, stateDir, scfg)
      .as[(Long, Long)].collect().toMap
    assert(incClusters === batchClusters)
  }

  test("crash-before-commit replay recomputes the batch instead of wiping it") {
    val stateDir = Files.createTempDirectory("graft-stream-crash").toString
    val parts = corpus.grouped(corpus.size / 2 + 1).toSeq
    def df(chunk: Seq[graft.model.CorpusRow]) =
      spark.createDataFrame(chunk).select("repo", "path", "commit", "lang", "content")
    IncrementalDedup.processBatch(spark, df(parts.head), stateDir, cfg, batchId = 0L)
    // batch 1 completes, then we simulate a crash AFTER the partition
    // writes but BEFORE the commit marker by deleting the marker
    val r1 = IncrementalDedup.processBatch(spark, df(parts(1)), stateDir, cfg, batchId = 1L)
    val marker = new org.apache.hadoop.fs.Path(s"$stateDir/_commits/batch-1")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(marker, false)
    // Structured Streaming replays batch 1: the uncommitted batch=1
    // partitions must NOT be trusted by the re-ingest anti-join (a replay
    // that saw its own half-written docs would overwrite the partitions
    // with empty data and lose the batch)
    val r2 = IncrementalDedup.processBatch(spark, df(parts(1)), stateDir, cfg, batchId = 1L)
    assert(r2.totalDocs === corpus.size.toLong, "replay lost batch docs")
    assert(r2.newPairs === r1.newPairs, "replay changed the emitted pair set")
    val docs1 = spark.read.parquet(s"$stateDir/docs/batch=1").count()
    assert(docs1 === parts(1).size.toLong, "batch-1 partition was wiped by the replay")
  }

  test("crash mid pairs-swap (after delete, before rename) is recovered, not wiped") {
    val stateDir = Files.createTempDirectory("graft-stream-swap").toString
    val parts = corpus.grouped(corpus.size / 2 + 1).toSeq
    def df(chunk: Seq[graft.model.CorpusRow]) =
      spark.createDataFrame(chunk).select("repo", "path", "commit", "lang", "content")
    IncrementalDedup.processBatch(spark, df(parts.head), stateDir, cfg, batchId = 0L)
    IncrementalDedup.processBatch(spark, df(parts(1)), stateDir, cfg, batchId = 1L)
    val expect = IncrementalDedup.clusters(spark, stateDir).as[(Long, Long)].collect().toMap
    val pairsBefore = new io.ParquetCatalog(stateDir).read(spark, "pairs").count()

    // simulate the non-atomic swap's crash window: `pairs` deleted, rename
    // to come — i.e. the merged table exists only as pairs_next
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(stateDir, "pairs"),
      new org.apache.hadoop.fs.Path(stateDir, "pairs_next")))

    // any reader/replay entry point must finish the rename first; the old
    // behavior silently rebuilt the edge table from one batch's pairs
    val got = IncrementalDedup.clusters(spark, stateDir).as[(Long, Long)].collect().toMap
    assert(got === expect, "recovered clusters differ from pre-crash clusters")
    assert(new io.ParquetCatalog(stateDir).read(spark, "pairs").count() === pairsBefore)
  }

  test("running stop-band counts suppress hot buckets; bookkeeping matches a recount") {
    def mk(i: Int) = graft.model.CorpusRow(s"r$i", s"p/$i", "c", "en",
      s"u$i " + (0 until 150).map(t => s"tok$t").mkString(" ")) // near-dups, no exact dups
    def df(rows: Seq[graft.model.CorpusRow]) =
      spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")

    // control: default stop cap → the near-dup clique is found
    val ctlDir = Files.createTempDirectory("graft-stream-stopctl").toString
    IncrementalDedup.processBatch(spark, df((0 until 6).map(mk)), ctlDir, cfg)
    val r2c = IncrementalDedup.processBatch(spark, df((6 until 12).map(mk)), ctlDir, cfg)
    assert(r2c.newPairs > 0, "control: near-dup batch produced no pairs")

    // stopBandSize=1: every bucket with >=2 members is hot → zero LSH
    // candidates can ever be emitted (and there are no exact edges)
    val stopDir = Files.createTempDirectory("graft-stream-stop").toString
    val scfg = cfg.copy(stopBandSize = 1)
    val r1 = IncrementalDedup.processBatch(spark, df((0 until 6).map(mk)), stopDir, scfg)
    val r2 = IncrementalDedup.processBatch(spark, df((6 until 12).map(mk)), stopDir, scfg)
    assert(r1.newPairs === 0L && r2.newPairs === 0L,
      s"stop-banded stream emitted pairs: ${r1.newPairs}/${r2.newPairs}")

    // the running per-key counts must equal a direct recount of the
    // accumulated band state (accumulation across batches is exact)
    val fromCounts = spark.read.parquet(s"$stopDir/band_counts")
      .groupBy("band", "band_hash")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("n"))
      .as[(Int, Long, Long)].collect().map { case (b, h, n) => ((b, h), n) }.toMap
    val direct = spark.read.parquet(s"$stopDir/bands")
      .groupBy("band", "band_hash").count()
      .as[(Int, Long, Long)].collect().map { case (b, h, n) => ((b, h), n) }.toMap
    assert(fromCounts === direct, "running band counts drifted from the band state")
    assert(direct.values.exists(_ > 1), "scenario produced no multi-member bucket")
  }

  test("per-batch shuffle read stays ~flat while accumulated state grows (probe-side prune)") {
    val stateDir = Files.createTempDirectory("graft-stream-shuffle").toString
    val parts = corpus.grouped((corpus.size + 3) / 4).toSeq // 4 equal batches
    def df(chunk: Seq[graft.model.CorpusRow]) =
      spark.createDataFrame(chunk).select("repo", "path", "commit", "lang", "content")

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val perBatch = parts.map { chunk =>
        bytes.set(0L)
        IncrementalDedup.processBatch(spark, df(chunk), stateDir, cfg)
        org.apache.spark.GraftTestBridge.waitListenerBus(spark.sparkContext)
        bytes.get()
      }
      // accumulated band/gram/signature state quadruples from batch 1 to
      // batch 4; the broadcast semi-join prunes keep it OUT of the
      // exchanges, so per-batch shuffle volume must track the BATCH
      // (constant here) plus output-sized terms (pairs merge, cross-batch
      // matches) — allow 1.5x headroom over the equal-sized first batch;
      // an unpruned probe side would re-shuffle the full accumulated
      // band+gram state (multiples of a batch's own volume) and blow
      // far past it
      assert(perBatch(3) < (perBatch(0) * 1.5).toLong,
        s"per-batch shuffle grew with corpus: ${perBatch.mkString(", ")} bytes")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("streaming query over a parquet file stream drives the same state") {
    val stateDir = Files.createTempDirectory("graft-stream2").toString
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val df = spark.createDataFrame(corpus.take(200))
      .select("repo", "path", "commit", "lang", "content")
    df.coalesce(1).write.mode("append").parquet(inDir)

    val q = IncrementalDedup.startStream(spark, inDir, df.schema, stateDir, cfg)
    try {
      q.processAllAvailable()
    } finally q.stop()

    val docs = new io.ParquetCatalog(stateDir).read(spark, "docs").count()
    assert(docs === 200L)
  }
}
