package graft.streaming

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
  * band rows against the persisted band table — only pairs touching a new
  * doc are generated, old×old never recomputed. Verified pairs append to a
  * persisted edge table; clusters are re-derived from the accumulated edges
  * (CC is cheap relative to signature work; production would run it
  * periodically).
  *
  * The streaming face ([[startStream]]) is `readStream` →
  * `foreachBatch(processBatch)`: Structured Streaming provides exactly-once
  * batch ids + offset tracking, and state lives in ordinary tables — the
  * same checkpoint-as-contract design as the batch pipeline.
  *
  * Skew note: the incremental candidate join relies on AQE skew-split (the
  * join side is a shuffle join, which AQE *can* split, unlike the batch
  * path's flatMapGroups); production would additionally maintain running
  * band counts to drop stop-bands. The suffix/containment pass is not
  * incremental — it runs in the periodic full recluster (documented
  * deviation, SURVEY.md §2.8 row 44).
  */
object IncrementalDedup {

  final case class BatchResult(newPairs: Long, totalDocs: Long)

  def processBatch(
      spark: SparkSession,
      corpusBatch: DataFrame,
      stateDir: String,
      cfg: DedupConfig = DedupConfig.default): BatchResult = {
    val cat = new ParquetCatalog(stateDir)

    val t1New = graft.ingest.Ingest.ingest(corpusBatch)
      .select("doc_id", "repo", "lang", "content_sha256", "content")
    cat.write(t1New, "incoming_t1")
    val t1NewD = cat.read(spark, "incoming_t1")

    val sigsNew = DedupPipeline.signatures(spark, t1NewD, cfg)
    cat.write(sigsNew, "incoming_sigs")
    val sigsNewD = cat.read(spark, "incoming_sigs")
    val bandsNew = graft.lsh.Banding.bandRows(sigsNewD, cfg)

    val haveState = cat.exists(spark, "bands")
    val bandsAll =
      if (haveState) cat.read(spark, "bands").unionByName(bandsNew) else bandsNew
    val sigsAll =
      if (haveState) cat.read(spark, "signatures").unionByName(sigsNewD) else sigsNewD
    val shaAll =
      if (haveState)
        cat.read(spark, "docs").select("doc_id", "content_sha256")
          .unionByName(t1NewD.select("doc_id", "content_sha256"))
      else t1NewD.select("doc_id", "content_sha256")

    // LSH candidates touching a new doc: equi-join new bands × all bands.
    val lshCands = bandsNew.select(col("band"), col("band_hash"), col("doc_id").as("n"))
      .join(bandsAll.select(col("band"), col("band_hash"), col("doc_id").as("m")),
        Seq("band", "band_hash"))
      .where(col("n") =!= col("m"))
      .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"),
        when(col("band") < cfg.bands, "minhash").otherwise("simhash").as("src"))
      .groupBy("a", "b").agg(min("src").as("src"))

    // exact dups touching a new doc
    val exactCands = t1NewD.select(col("content_sha256"), col("doc_id").as("n"))
      .join(shaAll.select(col("content_sha256"), col("doc_id").as("m")), "content_sha256")
      .where(col("n") =!= col("m"))
      .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"),
        lit("exact").as("src"))
      .distinct()

    val verified = graft.verify.Verifier
      .verifyLshPairs(lshCands, sigsAll, cfg)
      .unionByName(exactCands.withColumn("est_jaccard", lit(1.0d))
        .select("a", "b", "est_jaccard", "src"))
      .groupBy("a", "b").agg(graft.lsh.CandidatePairs.strongestSrc.as("src"),
        max("est_jaccard").as("est_jaccard"))

    // Commit protocol: state tables are read and replaced in the same
    // batch, so each is written to `<name>_next` and atomically swapped in
    // (delete + rename) only after all writes succeeded — a crash before
    // the swap leaves the previous state intact and Structured Streaming
    // replays the batch. (Iceberg's createOrReplace subsumes this in prod.)
    val pairsAll =
      if (cat.exists(spark, "pairs"))
        cat.read(spark, "pairs").unionByName(verified).groupBy("a", "b")
          .agg(graft.lsh.CandidatePairs.strongestSrc.as("src"),
            max("est_jaccard").as("est_jaccard"))
      else verified
    val newPairCount = verified.count()

    cat.write(pairsAll, "pairs_next")
    cat.write(bandsAll, "bands_next")
    cat.write(sigsAll, "signatures_next")
    cat.write(shaAll, "docs_next")
    Seq("pairs", "bands", "signatures", "docs").foreach(swapIn(spark, stateDir, _))
    val totalDocs = cat.read(spark, "docs").count()
    BatchResult(newPairCount, totalDocs)
  }

  private def swapIn(spark: SparkSession, stateDir: String, name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(stateDir, name)
    val next = new org.apache.hadoop.fs.Path(stateDir, s"${name}_next")
    if (fs.exists(cur)) fs.delete(cur, true)
    fs.rename(next, cur)
  }

  /** Final clusters over the accumulated edge table. */
  def clusters(spark: SparkSession, stateDir: String): DataFrame = {
    val cat = new ParquetCatalog(stateDir)
    val docs = cat.read(spark, "docs").select("doc_id")
    val mapping = graft.cc.ConnectedComponents.run(
      spark, cat.read(spark, "pairs").select("a", "b"))
    graft.cc.ConnectedComponents.assignAll(docs, mapping)
  }

  /** Streaming entry: parquet file stream → foreachBatch incremental. */
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, stateDir, cfg); ()
      }
      .option("checkpointLocation", s"$stateDir/_stream_checkpoint")
      .start()
  }
}
