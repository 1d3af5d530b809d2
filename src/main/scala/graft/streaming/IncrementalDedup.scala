package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.DedupPipeline
import graft.conf.DedupConfig
import graft.io.ParquetCatalog

/** Incremental / streaming dedup (SURVEY.md §2.8).
  *
  * Batch-incremental core ([[processBatch]]): new docs are ingested, signed
  * and banded; candidates are new×(old ∪ new) via an equi-join of the new
  * band rows against the accumulated band table — only pairs touching a new
  * doc are generated, old×old never recomputed.
  *
  * State layout — APPEND-ONLY where the state grows with the corpus:
  * `bands/`, `signatures/`, `docs/` are partitioned by `batch=<id>`; a
  * micro-batch writes ONLY its own partition, so per-batch write volume is
  * ∝ batch size (the old design rewrote the full accumulated state every
  * batch — O(corpus) I/O per batch, quadratic over a stream's life). The
  * `pairs` edge table stays merge-rewritten via an atomic `_next` swap: it
  * is small relative to bands/signatures (verified edges only) and the
  * merge dedups replayed edges; production would compact it periodically.
  *
  * Exactly-once: a batch id is committed by writing a `_commits/batch-<id>`
  * marker LAST. A replayed id (Structured Streaming restart, crash between
  * the partition writes and the marker) is either skipped (marker present)
  * or safely re-run: partition writes are overwrite-idempotent and the
  * pairs merge dedups. Re-ingest of an already-known doc_id (at any batch)
  * is dropped by an anti-join against the accumulated docs, so state rows
  * stay unique per doc and candidate joins never inflate.
  *
  * The streaming face ([[startStream]]) is `readStream` →
  * `foreachBatch(processBatch)` with the real batch id passed through.
  *
  * Probe-side pruning: the accumulated band table is O(corpus), but only
  * rows whose (band, band_hash) occurs in THIS batch can produce a
  * candidate — a broadcast left_semi against the new batch's distinct keys
  * turns the per-batch O(corpus) band shuffle into a scan+filter (no
  * exchange of the accumulated side at all; per-batch shuffle volume is
  * ∝ batch + matches, asserted sublinear by StreamingSpec).
  *
  * Skew/stop-bands: a per-batch `band_counts` partition (append-only, like
  * bands) maintains RUNNING band sizes; keys whose accumulated count
  * exceeds cfg.stopBandSize are dropped from both join sides — the batch
  * pipeline's stop-band policy, incrementally. Without it a hot band in a
  * stream grows unbounded candidate emission until the periodic recluster.
  * Remaining within-cap skew is AQE skew-split's job (the join is a shuffle
  * join, which AQE *can* split, unlike the batch path's flatMapGroups).
  *
  * Suffix/containment pass, incremental with EXACT batch semantics: the
  * batch pass drops a gram whose doc-frequency exceeds `suffixDfMax`
  * RETROACTIVELY (boilerplate headers must never create pairs even if their
  * first few carriers arrive early), which a stream cannot do by un-emitting.
  * Instead each batch appends verified suffix pairs WITH their anchor-gram
  * provenance (`sfx_pairs/batch=<id>`: a, b, fp) plus per-batch gram counts
  * (`gram_counts/batch=<id>`), and [[edges]] filters at READ time against
  * the accumulated counts: a pair is live iff ≥1 of its anchor grams has
  * final df ≤ cap. df only grows, so "emitted under the running cap, then
  * filtered by the final cap" equals the batch rule exactly (StreamingSpec
  * asserts cluster equality against the batch pipeline WITH suffix pass).
  */
object IncrementalDedup {

  final case class BatchResult(newPairs: Long, totalDocs: Long, newSuffixPairs: Long = 0L)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committed(spark: SparkSession, stateDir: String, id: Long): Boolean =
    fs(spark, stateDir).exists(new Path(s"$stateDir/_commits/batch-$id"))

  private def commit(spark: SparkSession, stateDir: String, id: Long): Unit = {
    val f = fs(spark, stateDir)
    f.mkdirs(new Path(s"$stateDir/_commits"))
    f.create(new Path(s"$stateDir/_commits/batch-$id"), true).close()
  }

  private def committedIds(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new Path(s"$stateDir/_commits")
    val f = fs(spark, stateDir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).map(_.getPath.getName.stripPrefix("batch-").toLong).toSeq
  }

  private def nextBatchId(spark: SparkSession, stateDir: String): Long =
    committedIds(spark, stateDir).foldLeft(-1L)(math.max) + 1L

  /** Read an append-only state table restricted to COMMITTED batch
    * partitions (plus optionally the current batch's own, just-written
    * one). An uncommitted partition is a crashed batch's half-written
    * leftovers: trusting it during replay would make the re-ingest
    * anti-join see the batch's own docs, compute an empty "fresh" set and
    * overwrite the partitions with empty data — silently losing the batch.
    */
  private def readState(spark: SparkSession, stateDir: String, name: String,
      committed: Seq[Long], alsoBatch: Long = -1L): Option[DataFrame] = {
    val p = new Path(s"$stateDir/$name")
    if (!fs(spark, stateDir).exists(p)) None
    else {
      val ids = committed ++ (if (alsoBatch >= 0) Seq(alsoBatch) else Nil)
      if (ids.isEmpty) None
      else Some(spark.read.parquet(p.toString).where(col("batch").isin(ids: _*)))
    }
  }

  /** @param batchId streaming micro-batch id for exactly-once replay
    *        detection; pass -1 (default) to auto-assign the next id for
    *        direct/batch callers.
    */
  def processBatch(
      spark: SparkSession,
      corpusBatch: DataFrame,
      stateDir: String,
      cfg: DedupConfig = DedupConfig.default,
      batchId: Long = -1L): BatchResult = {
    val cat = new ParquetCatalog(stateDir)
    recoverSwap(spark, stateDir, "pairs")
    val id = if (batchId >= 0) batchId else nextBatchId(spark, stateDir)
    val done = committedIds(spark, stateDir)
    if (done.contains(id)) {
      // replayed batch: state already reflects it
      return BatchResult(0L,
        readState(spark, stateDir, "docs", done).map(_.count()).getOrElse(0L))
    }

    val docsOld = readState(spark, stateDir, "docs", done)
      .map(_.select("doc_id", "content_sha256"))

    // genuinely-new docs only: replay/re-ingest of a known doc_id must not
    // duplicate state rows (slim anti-join on the id)
    val t1Raw = graft.ingest.Ingest.ingest(corpusBatch)
      .select("doc_id", "repo", "lang", "content_sha256", "content")
      .dropDuplicates("doc_id")
    val t1Fresh = docsOld match {
      case Some(old) => t1Raw.join(old.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => t1Raw
    }
    cat.write(t1Fresh, "incoming_t1") // scratch, overwritten every batch
    val t1New = cat.read(spark, "incoming_t1")

    val sigsNew = DedupPipeline.signatures(spark, t1New, cfg)
    // append-only writes: ONLY this batch's partition is touched
    sigsNew.write.mode("overwrite").parquet(s"$stateDir/signatures/batch=$id")
    val sigsNewD = spark.read.parquet(s"$stateDir/signatures/batch=$id")
    val bandsNew = graft.lsh.Banding.bandRows(sigsNewD, cfg)
    bandsNew.write.mode("overwrite").parquet(s"$stateDir/bands/batch=$id")
    t1New.select("doc_id", "content_sha256")
      .write.mode("overwrite").parquet(s"$stateDir/docs/batch=$id")

    val bandsNewD = spark.read.parquet(s"$stateDir/bands/batch=$id")
    // running band counts: this batch's per-key counts land in their own
    // append-only partition, exactly like bands/signatures
    bandsNewD.groupBy("band", "band_hash").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$stateDir/band_counts/batch=$id")

    // Suffix state is kept per sha-REP (the first batch carrying a content
    // wins; within a batch the min doc_id): gram doc-frequency then counts
    // DISTINCT contents — the batch pass's df semantics — and the
    // identical-content mass never enters the token/gram state. Member
    // docs' suffix pairs are implied by the exact-star edges, exactly as in
    // the batch pipeline's rep-only design.
    val newShaDocs = docsOld match {
      case Some(old) => t1New.join(old.select("content_sha256").distinct(),
        Seq("content_sha256"), "left_anti")
      case None => t1New
    }
    val repsNew = newShaDocs.join(
      newShaDocs.groupBy("content_sha256").agg(min("doc_id").as("doc_id")),
      Seq("content_sha256", "doc_id"))
    val newSfxPairs = suffixIncrement(spark, stateDir, repsNew, done, id, cfg)

    val bandsAll = readState(spark, stateDir, "bands", done, alsoBatch = id).get
      .select("band", "band_hash", "doc_id")
    val sigsAll = readState(spark, stateDir, "signatures", done, alsoBatch = id).get
      .select("doc_id", "minhash", "simhash")
    val shaAll = readState(spark, stateDir, "docs", done, alsoBatch = id).get
      .select("doc_id", "content_sha256")

    // Probe-side prune: only accumulated rows whose key occurs in THIS
    // batch can join — broadcast semi-join keeps the O(corpus) band state
    // out of the exchange entirely (scan+filter, ∝ batch shuffle).
    val newKeys = bandsNewD.select("band", "band_hash").distinct()
    // Stop-bands from RUNNING counts, scoped to this batch's keys (the
    // count state is also O(corpus keys); only keys being probed matter).
    val hotKeys = readState(spark, stateDir, "band_counts", done, alsoBatch = id).get
      .join(broadcast(newKeys), Seq("band", "band_hash"), "left_semi")
      .groupBy("band", "band_hash").agg(sum("cnt").as("total"))
      .where(col("total") > cfg.stopBandSize)
      .select("band", "band_hash")
    val bandsNewKept = bandsNewD.select("band", "band_hash", "doc_id")
      .join(broadcast(hotKeys), Seq("band", "band_hash"), "left_anti")
    val bandsProbe = bandsAll
      .join(broadcast(newKeys), Seq("band", "band_hash"), "left_semi")
      .join(broadcast(hotKeys), Seq("band", "band_hash"), "left_anti")

    // LSH candidates touching a new doc: equi-join new bands × pruned bands.
    val lshCands = bandsNewKept.select(col("band"), col("band_hash"), col("doc_id").as("n"))
      .join(bandsProbe.select(col("band"), col("band_hash"), col("doc_id").as("m")),
        Seq("band", "band_hash"))
      .where(col("n") =!= col("m"))
      .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"),
        when(col("band") < cfg.bands, "minhash").otherwise("simhash").as("src"))
      .transform(graft.lsh.CandidatePairs.strongest)

    // exact dups touching a new doc
    val exactCands = t1New.select(col("content_sha256"), col("doc_id").as("n"))
      .join(shaAll.select(col("content_sha256"), col("doc_id").as("m")), "content_sha256")
      .where(col("n") =!= col("m"))
      .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"),
        lit("exact").as("src"))
      .distinct()

    val verified = graft.lsh.CandidatePairs.strongestWithEst(
      graft.verify.Verifier.verifyLshPairs(lshCands, sigsAll, cfg)
        .unionByName(exactCands.withColumn("est_jaccard", lit(1.0d))
          .select("a", "b", "est_jaccard", "src")))

    // pairs: merge-rewrite through <name>_next + atomic swap; the groupBy
    // dedup makes a replayed merge a no-op, so a crash anywhere before the
    // commit marker is safe to re-run.
    val pairsAll =
      if (cat.exists(spark, "pairs"))
        graft.lsh.CandidatePairs.strongestWithEst(
          cat.read(spark, "pairs").unionByName(verified))
      else verified
    val newPairCount = verified.count()

    cat.write(pairsAll, "pairs_next")
    swapIn(spark, stateDir, "pairs")
    commit(spark, stateDir, id)
    val totalDocs = readState(spark, stateDir, "docs", done, alsoBatch = id)
      .map(_.count()).getOrElse(0L)
    BatchResult(newPairCount, totalDocs, newSfxPairs)
  }

  /** Incremental suffix/containment pass (scaladoc above): tokenize the new
    * sha-rep docs, append their token streams / minLen-gram index /
    * per-gram counts as batch partitions, generate candidates new×all over
    * grams under the RUNNING df-cap (broadcast-pruned probe side, like the
    * band join), verify with the per-pair suffix-array kernel, and append
    * the verified pairs WITH anchor-gram provenance — the read side
    * ([[edges]]) applies the final retroactive cap.
    *
    * @return number of verified suffix pair rows appended for this batch
    */
  private def suffixIncrement(spark: SparkSession, stateDir: String,
      repsNew: DataFrame, done: Seq[Long], id: Long, cfg: DedupConfig): Long = {
    import spark.implicits._
    val minLen = cfg.suffixMinLen

    val toksNew = graft.suffix.SuffixPass.tokenDocs(spark, repsNew, cfg)
      .filter(_.tokens.length >= minLen) // can't hold a minLen run otherwise
    toksNew.toDF().write.mode("overwrite").parquet(s"$stateDir/toks/batch=$id")
    val toksNewD = spark.read.parquet(s"$stateDir/toks/batch=$id")

    toksNewD.select(col("doc_id"), col("tokens")).as[(Long, Array[Long])]
      .flatMap { case (d, tk) =>
        graft.suffix.SuffixPass.grams(tk, minLen).map(fp => (fp, d))
      }
      .toDF("fp", "doc_id")
      .write.mode("overwrite").parquet(s"$stateDir/grams/batch=$id")
    val gramsNewD = spark.read.parquet(s"$stateDir/grams/batch=$id")
    // grams() emits distinct grams per doc, so count(*) = docs-per-gram
    gramsNewD.groupBy("fp").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$stateDir/gram_counts/batch=$id")

    // probe-side prune + running df-cap, same shape as the band join
    val newFps = gramsNewD.select("fp").distinct()
    val hotFps = readState(spark, stateDir, "gram_counts", done, alsoBatch = id).get
      .join(broadcast(newFps), Seq("fp"), "left_semi")
      .groupBy("fp").agg(sum("cnt").as("total"))
      .where(col("total") > cfg.suffixDfMax)
      .select("fp")
    val gramsNewKept = gramsNewD.join(broadcast(hotFps), Seq("fp"), "left_anti")
    val gramsProbe = readState(spark, stateDir, "grams", done, alsoBatch = id).get
      .join(broadcast(newFps), Seq("fp"), "left_semi")
      .join(broadcast(hotFps), Seq("fp"), "left_anti")

    // candidate pairs WITH anchor-gram provenance (read-time cap needs it)
    val prov = gramsNewKept.select(col("fp"), col("doc_id").as("n"))
      .join(gramsProbe.select(col("fp"), col("doc_id").as("m")), Seq("fp"))
      .where(col("n") =!= col("m"))
      .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"), col("fp"))
      .distinct()

    // verify each distinct pair once; token streams attach broadcast-pruned
    val candPairs = prov.select("a", "b").distinct()
    val ends = candPairs.select(col("a").as("doc_id"))
      .unionByName(candPairs.select(col("b").as("doc_id"))).distinct()
    val toksCand = readState(spark, stateDir, "toks", done, alsoBatch = id).get
      .join(broadcast(ends), Seq("doc_id"), "left_semi")
    val verifiedSfx = candPairs
      .join(toksCand.select(col("doc_id").as("a"), col("tokens").as("ta")), "a")
      .join(toksCand.select(col("doc_id").as("b"), col("tokens").as("tb")), "b")
      .select(col("a"), col("b"), col("ta"), col("tb"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.flatMap { case (a, b, tA, tB) =>
        if (graft.suffix.SuffixArrays.maxCommonSubstring(tA, tB) >= minLen) Some((a, b))
        else None
      })
      .toDF("a", "b")

    prov.join(verifiedSfx, Seq("a", "b"), "left_semi")
      .write.mode("overwrite").parquet(s"$stateDir/sfx_pairs/batch=$id")
    spark.read.parquet(s"$stateDir/sfx_pairs/batch=$id")
      .select("a", "b").distinct().count()
  }

  /** The composed live edge set: the merged LSH/exact pairs table plus the
    * suffix pairs whose anchor gram is still under the FINAL df-cap
    * (retroactive boilerplate defense — see the class scaladoc).
    */
  def edges(spark: SparkSession, stateDir: String,
      cfg: DedupConfig = DedupConfig.default): DataFrame = {
    recoverSwap(spark, stateDir, "pairs")
    val cat = new ParquetCatalog(stateDir)
    val base = cat.read(spark, "pairs").select("a", "b")
    val committed = committedIds(spark, stateDir)
    (readState(spark, stateDir, "sfx_pairs", committed),
      readState(spark, stateDir, "gram_counts", committed)) match {
      case (Some(sfx), Some(counts)) =>
        val hot = counts.groupBy("fp").agg(sum("cnt").as("total"))
          .where(col("total") > cfg.suffixDfMax)
          .select("fp")
        base.unionByName(
          sfx.join(hot, Seq("fp"), "left_anti").select("a", "b").distinct())
      case _ => base
    }
  }

  private def swapIn(spark: SparkSession, stateDir: String, name: String): Unit = {
    val f = fs(spark, stateDir)
    val cur = new Path(stateDir, name)
    val next = new Path(stateDir, s"${name}_next")
    if (f.exists(cur)) f.delete(cur, true)
    f.rename(next, cur)
  }

  /** delete+rename is not atomic: a crash between swapIn's delete and
    * rename leaves only `<name>_next` — which at that point IS the full
    * merged table. Finish the rename before any reader sees a missing
    * table; the old behavior silently rebuilt the edge table from a single
    * batch's pairs, dropping all previously accumulated edges.
    */
  private def recoverSwap(spark: SparkSession, stateDir: String, name: String): Unit = {
    val f = fs(spark, stateDir)
    val cur = new Path(stateDir, name)
    val next = new Path(stateDir, s"${name}_next")
    if (!f.exists(cur) && f.exists(next)) f.rename(next, cur)
  }

  /** Final clusters over the accumulated live edge set (committed state
    * only; LSH/exact pairs ∪ retroactively-capped suffix pairs).
    */
  def clusters(spark: SparkSession, stateDir: String,
      cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val docs = readState(spark, stateDir, "docs", committedIds(spark, stateDir))
      .map(_.select("doc_id")).getOrElse(spark.emptyDataFrame.withColumn("doc_id", lit(0L)))
    val mapping = graft.cc.ConnectedComponents.run(spark, edges(spark, stateDir, cfg))
    graft.cc.ConnectedComponents.assignAll(docs, mapping)
  }

  /** Streaming entry: parquet file stream → foreachBatch incremental, with
    * the engine's batch id threaded through for replay detection.
    */
  def startStream(
      spark: SparkSession,
      inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String,
      cfg: DedupConfig = DedupConfig.default): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(spark, batch, stateDir, cfg, id); ()
      }
      .option("checkpointLocation", s"$stateDir/_stream_checkpoint")
      .start()
  }
}
