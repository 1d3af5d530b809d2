package graft.extra

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set preparation operators over the `documents` table — the
  * steps that sit between dedup and the tokenizer in a pre-training data
  * pipeline: deterministic train/val/test assignment, token-budget shard
  * packing, and stratified per-group sampling. Everything is a pure
  * column/window expression (codegen'd, no UDFs) and every output is
  * integer/string-only so the DuckDB oracle can check values exactly.
  */
object TrainPrep {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Deterministic, stateless train/val/test assignment: bucket 0..255 from
    * the first two hex chars of md5(doc_id ":" salt), split by fixed
    * thresholds (&lt;204 train ≈79.7%, &lt;230 val ≈10.2%, else test).
    *
    * Salted-hash assignment (rather than `rand()` or id-modulo) is the
    * production norm: it is reproducible across runs and engines, stable
    * under re-partitioning and incremental appends (a new doc's split never
    * depends on corpus state), and immune to id-assignment patterns that
    * make modulo splits correlated with crawl order. Embarrassingly
    * parallel — one codegen'd projection, no shuffle, scans 100 TB at
    * I/O speed.
    */
  def splitAssign(spark: SparkSession, sfDir: String,
                  salt: String = "graft-split-v1"): DataFrame = {
    val hx = md5(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val bucket = conv(substring(hx, 1, 2), 16, 10).cast("long")
    docs(spark, sfDir).select(
      col("doc_id"),
      bucket.as("hash_bucket"),
      when(bucket < 204, "train").when(bucket < 230, "val")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Token-budget shard packing: documents in doc_id order are packed into
    * shards of ~`budget` whitespace tokens (`shard_id = exclusive-prefix-sum
    * of n_tokens div budget` — a shard closes once the budget is crossed, so
    * each shard holds ≤ budget + max-doc-tokens − 1).
    *
    * The global prefix sum is the scale trap here: a naive
    * `sum over (order by doc_id)` window plans a SINGLE-partition sort —
    * the whole corpus through one task. This runs it as the classic
    * two-phase distributed scan instead: (1) bucket ids into `numBuckets`
    * CONTIGUOUS ranges by explicit arithmetic — not `repartitionByRange`,
    * whose reservoir-sampled boundaries could differ between the two jobs
    * that must agree on pid — and aggregate one token total per bucket
    * (tiny: `numBuckets` rows to the driver); (2) broadcast the exclusive
    * per-bucket offsets back and run the within-bucket prefix window
    * partitioned by pid, which is parallel. shard_id depends only on the
    * global doc_id order, so the result is invariant to `numBuckets`
    * (TrainPrepSpec proves 8 vs 64 identical).
    *
    * The even id-range buckets assume ids without pathological gaps (true
    * for ingest-assigned ids); a heavily clustered id space would skew
    * bucket sizes — raise `numBuckets` (the offsets table stays tiny) or
    * pre-normalize ids, rather than reaching for `repartitionByRange`,
    * which reintroduces the sampled-boundary consistency problem.
    */
  def packShards(spark: SparkSession, sfDir: String, budget: Long = 2000L,
                 numBuckets: Int = 64): DataFrame = {
    require(budget > 0 && numBuckets > 0)
    val d = docs(spark, sfDir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val Array(minId, maxId) =
      d.agg(min("doc_id"), max("doc_id")).collect()(0).toSeq.toArray
        .map(v => if (v == null) 0L else v.asInstanceOf[Long])
    val width = math.max(1L, (maxId - minId) / numBuckets + 1)
    // ANSI-safe integer division (`div`); pid is contiguous in doc_id.
    val withPid = d.withColumn(
      "pid", expr(s"CAST((doc_id - $minId) DIV $width AS INT)"))
    val offsets = withPid.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var run = 0L
    val exclusive = offsets.map { case (pid, t) =>
      val o = run; run += t; (pid, o)
    }
    val offDf = spark.createDataFrame(exclusive.toSeq).toDF("pid", "off")
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(broadcast(offDf), "pid")
      .withColumn("excl", coalesce(sum("n_tokens").over(w), lit(0L)) + col("off"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"excl DIV $budget").as("shard_id"))
      .orderBy("doc_id")
  }

  /** Per-shard rollup of [[packShards]] — the manifest a training job reads
    * (doc count + token mass per shard). */
  def shardStats(spark: SparkSession, sfDir: String,
                 budget: Long = 2000L): DataFrame =
    packShards(spark, sfDir, budget)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .orderBy("shard_id")

  /** Deterministic stratified sample: the `k` lowest salted-hash docs per
    * `lang` group (`row_number` over md5(doc_id ":" salt), doc_id as the
    * tie-break). Hash-ordered heads are the reproducible alternative to
    * `sampleBy`'s Bernoulli draw: exact group quotas, stable across runs,
    * and append-monotone ONLY in expectation — a new doc can displace a
    * sampled one, which is the correct semantics for a fixed-size quota.
    *
    * Scale note: the window sorts each lang partition — fine while groups
    * fit a task's spill budget. For planet-scale groups (billions of docs
    * per language), pre-filter by a hash prefix that overshoots k by ~10×
    * (e.g. `hash_bucket < ceil(10k/|group|·256)`) before the window, which
    * turns the sort into a top-k over a tiny fraction; the final
    * `row_number ≤ k` keeps the result exact whenever the pre-filter
    * survives ≥ k rows.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String, k: Int = 50,
                       salt: String = "graft-sample-v1"): DataFrame = {
    val hx = md5(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val w = Window.partitionBy("lang").orderBy(col("hx"), col("doc_id"))
    docs(spark, sfDir).select(col("doc_id"), col("lang"), hx.as("hx"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
      .select("doc_id", "lang", "sample_rank")
      .orderBy("doc_id")
  }
}
