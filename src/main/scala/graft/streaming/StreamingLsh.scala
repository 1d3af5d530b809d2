package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.DedupPipeline
import graft.conf.DedupConfig
import graft.model.{BandRow, BucketState, ProvPair}

/** Full streaming LSH with per-bucket state (SURVEY.md §2.8 row 44 — the
  * `flatMapGroupsWithState` path that round 1 documented but did not build).
  *
  * The stream of corpus rows is signed and banded exactly like the batch
  * path (same kernels, so signatures are bitwise-identical), then candidate
  * pairs are emitted IN-STREAM: the band rows are grouped by
  * (band, band_hash) and each group holds its bucket membership as typed
  * state — an arriving doc emits (new × already-seen) pairs immediately,
  * which is precisely the reference's tweet-at-a-time LSH lookup
  * (Petrović et al. 2010) generalized to Spark's state store.
  *
  * Scale/state discipline:
  *  - per-bucket state is an Array[Long] of doc ids, bounded by
  *    `cfg.stopBandSize`: a bucket that crosses the cap flips to `stopped`,
  *    DROPS its member array (state shrinks to a tombstone) and never emits
  *    again — the streaming analogue of batch stop-bands. The stream cannot
  *    un-emit, so every pair is emitted WITH its bucket key ([[ProvPair]]):
  *    applying [[retroLive]] over the materialized output against the FINAL
  *    band state reproduces the batch pass's retroactive drop exactly
  *    (same provenance design as IncrementalDedup's lsh_pairs table).
  *    Caveat: bucket membership is counted per DOC, while the batch
  *    pipeline counts sha-distinct REPS — so batch equivalence holds for
  *    sha-distinct input streams. Exact-duplicate docs inflate a bucket's
  *    count toward the cap; once tombstoned, pairs the rep-only batch count
  *    would still emit are never emitted and retroLive cannot resurrect
  *    them. Pass `dedupBySha = true` when the stream can carry exact
  *    duplicates — it inserts a first-carrier dedup stage (the enforcement
  *    of this precondition, not just a caveat); callers already feeding
  *    sha-distinct docs (IncrementalDedup's reps) skip the extra state.
  *  - emitted pairs are NOT deduped across buckets in-stream (that would
  *    need a second stateful stage); downstream `dropDuplicates("a","b")`
  *    or the periodic full recluster does it, same as the batch union.
  *
  * Verification composes downstream IN-STREAM via [[verifiedStream]]: a
  * stream-static join of the emitted pairs against a signature table + the
  * same Verifier rule (IncrementalDedup does the batch-side equivalent in
  * its foreachBatch form).
  */
object StreamingLsh {

  /** Corpus stream → banded signature rows (stateless unless
    * `dedupBySha` — see [[candidateStream]]).
    */
  def bandStream(spark: SparkSession, corpusStream: DataFrame, cfg: DedupConfig,
      dedupBySha: Boolean = false): Dataset[BandRow] = {
    import spark.implicits._
    val t1 = graft.ingest.Ingest.ingest(corpusStream)
    // first-carrier dedup: streaming dropDuplicates keeps one row per
    // previously-unseen content_sha256 (IncrementalDedup's rep discipline,
    // as a stateful stage). Unbounded sha state by design — the bucket
    // state below is unbounded over distinct content too.
    val t1In = if (dedupBySha) t1.dropDuplicates("content_sha256") else t1
    val sigs = DedupPipeline.signatures(spark, t1In, cfg)
    graft.lsh.Banding.bandRows(sigs, cfg)
      .select(col("doc_id"), col("band"), col("band_hash")).as[BandRow]
  }

  /** Stateful candidate emission: (band, band_hash) buckets held in typed
    * group state; each micro-batch emits new×seen ∪ new×new pairs per
    * bucket, with the stop cap enforced on the stored membership.
    *
    * `dedupBySha = true` ENFORCES the sha-distinct input precondition (see
    * the object scaladoc caveat) instead of documenting it: a first-carrier
    * dedup stage upstream makes bucket counts per-CONTENT, so exact-dup
    * floods cannot tombstone a bucket the rep-only batch count would keep.
    * Off by default only because a caller may already feed sha-distinct
    * docs (e.g. IncrementalDedup reps) and must not pay a second state
    * store for it.
    */
  def candidateStream(spark: SparkSession, corpusStream: DataFrame,
      cfg: DedupConfig = DedupConfig.default,
      dedupBySha: Boolean = false): Dataset[ProvPair] = {
    import spark.implicits._
    val stopCap = cfg.stopBandSize
    val nMinhashBands = cfg.bands
    bandStream(spark, corpusStream, cfg, dedupBySha)
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Array.emptyLongArray, stopped = false))
          if (st.stopped) {
            Iterator.empty
          } else {
            val seen = st.docs
            val seenSet = seen.toSet
            val fresh = rows.map(_.doc_id).toArray.distinct.filterNot(seenSet)
            java.util.Arrays.sort(fresh)
            if (fresh.isEmpty) Iterator.empty
            else {
              val total = seen.length + fresh.length
              if (total > stopCap) {
                // stop-bucket: tombstone the state (drop the member array so
                // hot buckets cost O(1) state forever after) and emit nothing
                state.update(BucketState(Array.emptyLongArray, stopped = true))
                Iterator.empty
              } else {
                state.update(BucketState(seen ++ fresh, stopped = false))
                val src = if (key._1 < nMinhashBands) "minhash" else "simhash"
                val newXold = for {
                  n <- fresh.iterator
                  o <- seen.iterator
                } yield ProvPair(math.min(n, o), math.max(n, o), src, key._1, key._2)
                val newXnew = for {
                  x <- fresh.indices.iterator
                  y <- (x + 1 until fresh.length).iterator
                } yield ProvPair(fresh(x), fresh(y), src, key._1, key._2)
                newXold ++ newXnew
              }
            }
          }
      }
  }

  /** Emit → verify composed in one streaming query: the stateful candidate
    * stream joined STREAM-STATIC against a signature table, then the exact
    * batch Verifier rule (est ≥ τ OR hamming ≤ max). Stays in Append mode —
    * verification is two equi-joins plus codegen'd column arithmetic, no
    * aggregation, so Structured Streaming plans it as-is.
    *
    * `sigsStatic` is re-read per micro-batch (stream-static join
    * semantics), so pointing it at the incremental state's accumulated
    * `signatures` table picks up newly committed partitions as the stream
    * progresses; pairs whose endpoints are not yet in the table are dropped
    * by the inner join (they re-emerge from the periodic full recluster —
    * same late-data contract as the batch union).
    */
  def verifiedStream(spark: SparkSession, corpusStream: DataFrame,
      sigsStatic: DataFrame, cfg: DedupConfig = DedupConfig.default): DataFrame =
    graft.verify.Verifier.verifyLshPairs(
      candidateStream(spark, corpusStream, cfg).toDF(), sigsStatic, cfg,
      passthrough = Seq("band", "band_hash"))

  /** The batch stop-band rule applied RETROACTIVELY over a materialized
    * (candidate or verified) pair table carrying (band, band_hash)
    * provenance: a pair stays iff ≥1 of its emitting buckets has final
    * count ≤ stopBandSize in `bandRows` (the accumulated band state the
    * batch pipeline would count). Run at recluster time — emission already
    * enforced the running cap; this closes the gap for buckets that crossed
    * it after emitting (the exact IncrementalDedup.liveLshPairs semantics).
    */
  def retroLive(pairsWithProv: DataFrame, bandRows: DataFrame, cfg: DedupConfig): DataFrame = {
    val hot = bandRows.groupBy("band", "band_hash").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > cfg.stopBandSize)
      .select("band", "band_hash")
    pairsWithProv.join(hot, Seq("band", "band_hash"), "left_anti")
      .select("a", "b").distinct()
  }
}
