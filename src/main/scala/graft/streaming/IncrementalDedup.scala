package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.DedupPipeline
import graft.conf.DedupConfig

/** Incremental / streaming dedup (SURVEY.md §2.8).
  *
  * Batch-incremental core ([[processBatch]]): new docs are ingested; the
  * sha-new ones' first carriers (one representative per previously-unseen
  * content_sha256 — the incremental analogue of the batch pipeline's
  * rep-only LSH over sha-distinct docs) are signed and banded; candidates
  * are new×(old ∪ new) via an equi-join of the new band rows against the
  * accumulated band table — only pairs touching a new rep are generated,
  * old×old never recomputed. Because signatures/bands/counts are functions
  * of CONTENT alone, the accumulated band state and its running counts are
  * row-for-row the ones the batch pipeline computes over the same corpus
  * (rep doc_ids differ — first arrival vs global min — but exact-star edges
  * glue members identically, so the cluster partition is the same).
  *
  * State layout — ALL pair/band/doc state is APPEND-ONLY, partitioned by
  * `batch=<id>`; a micro-batch writes ONLY its own partitions, so per-batch
  * write volume is ∝ batch size (an earlier design merge-rewrote a `pairs`
  * table through a delete+rename swap every batch — O(pairs) I/O per batch
  * plus a non-atomic crash window; with per-batch partitions there is no
  * rewrite and no swap at all).
  *
  * Exactly-once: a batch id is committed by writing a `_commits/batch-<id>`
  * marker LAST. A replayed id (Structured Streaming restart, crash between
  * the partition writes and the marker) is either skipped (marker present)
  * or safely re-run: readers ([[edges]], the in-batch state reads) only
  * trust COMMITTED partitions, and partition writes are
  * overwrite-idempotent. Re-ingest of an already-known doc_id (at any
  * batch) is dropped by an anti-join against the accumulated docs, so state
  * rows stay unique per doc and candidate joins never inflate.
  *
  * Probe-side pruning: the accumulated band/gram/signature state is
  * O(corpus), but only rows whose key occurs in THIS batch can produce a
  * candidate — a semi-join against the new batch's distinct keys turns the
  * per-batch O(corpus) shuffle into a scan+filter (no exchange of the
  * accumulated side; per-batch shuffle volume is ∝ batch + matches,
  * asserted sublinear by StreamingSpec). The key side is broadcast only
  * while provably small ([[semiPrune]]): gram fingerprints scale with token
  * count (~10^8 distinct for a 50k-doc batch), and an unconditional
  * broadcast() hint bypasses every driver-memory safety.
  *
  * Stop-bands, retroactive with EXACT batch semantics: the batch pass drops
  * a band whose FINAL rep-count exceeds `stopBandSize`; a stream cannot
  * un-emit, so each batch appends its verified LSH pairs WITH (band,
  * band_hash) provenance (`lsh_pairs/batch=<id>`) plus per-batch band
  * counts (`band_counts/batch=<id>`), and [[edges]] filters at READ time: a
  * pair is live iff ≥1 of its emitting bands has final accumulated count ≤
  * stopBandSize. Counts only grow, so "emitted under the running cap, then
  * filtered by the final cap" equals the batch rule exactly — a band under
  * the final cap was under the running cap at every emission, so every pair
  * it holds carries its provenance row; a band over the final cap is dead
  * regardless of when its pairs were emitted (StreamingSpec asserts cluster
  * equality against the batch pipeline across a mid-stream cap crossing).
  * The running-cap filter at emission time is the cost guard (a hot band in
  * a stream must not grow unbounded candidate emission); the read-time
  * filter is the semantics.
  *
  * The suffix/containment pass ([[suffixIncrement]]) is the same design one
  * level down: per-rep token/gram state, candidates under the running gram
  * df-cap, verified pairs appended with anchor-gram provenance
  * (`sfx_pairs/batch=<id>`), final-df filtering at read time.
  *
  * Exact-duplicate edges are linear, not pairwise: each batch appends a
  * within-batch star (batch-min doc per sha → its batch members) plus one
  * glue edge per sha that crosses batches (accumulated rep ↔ batch min) to
  * `exact_pairs/batch=<id>`. The edge SET differs from the batch pipeline's
  * global-rep star but spans the same components (a chain of stars), so the
  * cluster partition is identical — and a sha group of k docs arriving over
  * a stream's life costs O(k) edge rows, not the O(k²) a new×all-old
  * content_sha256 join would write.
  *
  * The streaming face ([[startStream]]) is `readStream` →
  * `foreachBatch(processBatch)` with the real batch id passed through.
  */
object IncrementalDedup {

  final case class BatchResult(newPairs: Long, totalDocs: Long, newSuffixPairs: Long = 0L)

  /** Keys-side row cap for broadcasting the semi-join prunes; above it fall
    * back to a shuffle semi-join (correct, just pays an exchange — a batch
    * that large dominates the join cost anyway).
    */
  private val BroadcastKeyCap = 2000000L

  private def semiPrune(state: DataFrame, keys: DataFrame, keyCols: Seq[String],
      keyRowsUpperBound: Long): DataFrame =
    if (keyRowsUpperBound <= BroadcastKeyCap)
      state.join(broadcast(keys), keyCols, "left_semi")
    else state.join(keys, keyCols, "left_semi")

  private def antiPrune(state: DataFrame, keys: DataFrame, keyCols: Seq[String],
      keyRowsUpperBound: Long): DataFrame =
    if (keyRowsUpperBound <= BroadcastKeyCap)
      state.join(broadcast(keys), keyCols, "left_anti")
    else state.join(keys, keyCols, "left_anti")

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run independent Spark actions on concurrent threads and await all.
    * The per-batch floor is FIXED job cost (scheduling + parquet commit),
    * not task compute — overlapping independent write chains halves the
    * wall without touching what is written. A failure in any task
    * propagates before the caller reaches its commit marker, so the
    * exactly-once replay contract is unchanged.
    *
    * Every task runs under one shared Spark job group: when a chain fails
    * (or exceeds the bounded await — default 120 min, env
    * `GRAFT_CHAIN_TIMEOUT_MIN`), the group is cancelled so orphaned sibling
    * jobs cannot keep writing `<table>/batch=<id>` partitions concurrently
    * with a same-JVM replay of the failed batch; the error names the chain
    * so a wedged FS call is debuggable instead of an unbounded silent hang.
    * All tasks are awaited as Try BEFORE the first failure propagates.
    */
  private[graft] def inParallel[A](sc: org.apache.spark.SparkContext,
      tasks: Seq[(String, () => A)]): Seq[A] = {
    import scala.util.{Failure, Try}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    val group = s"graft-incr-${java.util.UUID.randomUUID()}"
    val timeoutMin = sys.props.get("graft.chainTimeoutMin")
      .orElse(sys.env.get("GRAFT_CHAIN_TIMEOUT_MIN"))
      .flatMap(_.toLongOption).getOrElse(120L)
    try {
      val futs = tasks.map { case (name, t) =>
        name -> pool.submit(new java.util.concurrent.Callable[Try[A]] {
          def call(): Try[A] = {
            sc.setJobGroup(group, s"incr chain $name", interruptOnCancel = true)
            try Try(t()) finally sc.clearJobGroup()
          }
        })
      }
      val results = futs.map { case (name, f) =>
        name -> (Try(f.get(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)) match {
          case Failure(_: java.util.concurrent.TimeoutException) =>
            Failure(new RuntimeException(
              s"state chain '$name' still running after $timeoutMin min — wedged write?"))
          case Failure(e) => Failure(e)
          case scala.util.Success(inner) => inner
        })
      }
      results.collectFirst { case (name, Failure(e)) =>
        sc.cancelJobGroup(group) // stop still-running sibling chains first
        throw new RuntimeException(s"state chain '$name' failed", e)
      }
      results.map(_._2.get)
    } finally pool.shutdown()
  }

  private val Debug = sys.env.get("GRAFT_INCR_DEBUG").contains("1")
  private def timed[A](name: String)(f: => A): A =
    if (!Debug) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[incr] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

  /** Row count of a write job read from an attached [[Observation]] — the
    * count the batch needs anyway, without a second job over the written
    * partition.
    */
  private def writeCounted(df: DataFrame, dest: String): Long = {
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(dest)
    obs.get("n").asInstanceOf[Long]
  }

  private def commit(spark: SparkSession, stateDir: String, id: Long): Unit = {
    val f = fs(spark, stateDir)
    f.mkdirs(new Path(s"$stateDir/_commits"))
    f.create(new Path(s"$stateDir/_commits/batch-$id"), true).close()
  }

  /** Compaction base marker: `base-<gen>-<upto>` declares that partition
    * `batch=-<gen>` of every state table holds the union of all regular
    * batches ≤ upto (see [[compactState]]).
    */
  private case class BaseInfo(gen: Long, upto: Long)

  private def commitMarkers(spark: SparkSession, stateDir: String): Seq[String] = {
    val p = new Path(s"$stateDir/_commits")
    val f = fs(spark, stateDir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).map(_.getPath.getName).toSeq
  }

  private def baseInfo(markers: Seq[String]): Option[BaseInfo] =
    markers.collect { case s if s.startsWith("base-") =>
      val parts = s.stripPrefix("base-").split("-")
      BaseInfo(parts(0).toLong, parts(1).toLong)
    }.sortBy(_.gen).lastOption

  private def regularIds(markers: Seq[String]): Seq[Long] =
    markers.collect { case s if s.startsWith("batch-") =>
      s.stripPrefix("batch-").toLong
    }

  /** Live committed partition ids: the newest base (as `-gen`) plus every
    * regular batch it does not supersede. Regular ids are engine batch ids
    * (≥ 0), so the negative base id can never collide with a replay.
    */
  private def committedIds(spark: SparkSession, stateDir: String): Seq[Long] =
    liveIds(commitMarkers(spark, stateDir))

  private def liveIds(markers: Seq[String]): Seq[Long] =
    baseInfo(markers) match {
      case Some(b) => (-b.gen) +: regularIds(markers).filter(_ > b.upto)
      case None => regularIds(markers)
    }

  private def nextBatchId(spark: SparkSession, stateDir: String): Long = {
    val markers = commitMarkers(spark, stateDir)
    (regularIds(markers) ++ baseInfo(markers).map(_.upto))
      .foldLeft(-1L)(math.max) + 1L
  }

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
    * @param collectStats when false, skip the pure-REPORTING driver actions
    *        (new-pair / total-doc / suffix-pair counts — 3 extra jobs per
    *        batch on the measured 8–10 s fixed-cost floor) and return -1
    *        sentinels in [[BatchResult]]; state writes, prune-bound counts
    *        and lineage are unaffected.
    */
  def processBatch(
      spark: SparkSession,
      corpusBatch: DataFrame,
      stateDir: String,
      cfg: DedupConfig = DedupConfig.default,
      batchId: Long = -1L,
      collectStats: Boolean = true): BatchResult = {
    val tBatch0 = System.nanoTime()
    val id = if (batchId >= 0) batchId else nextBatchId(spark, stateDir)
    // a compacted-away id must fail LOUDLY: committing fresh docs under an
    // id ≤ base.upto would write state that committedIds filters out
    // forever (silent data loss). A legitimate crash-replay of the LATEST
    // epoch can never trip this — compactState always leaves the newest
    // committed batch un-superseded — so reaching here means a stream
    // checkpoint was recreated against an old compacted state dir; the
    // operator must use a fresh state dir or auto-assigned ids.
    val markers = commitMarkers(spark, stateDir)
    baseInfo(markers).foreach { b =>
      require(id > b.upto,
        s"batch id $id is superseded by compaction (base upto=${b.upto}); " +
          "a recreated stream checkpoint cannot reuse compacted-away ids")
    }
    val done = liveIds(markers)
    if (done.contains(id)) {
      // replayed batch: state already reflects it. The docs count is pure
      // reporting — a collectStats=false stream replay must not pay an
      // O(state) count job for a sentinel nobody reads.
      return BatchResult(0L,
        if (!collectStats) -1L
        else readState(spark, stateDir, "docs", done).map(_.count()).getOrElse(0L))
    }

    val docsOld = readState(spark, stateDir, "docs", done)
      .map(_.select("doc_id", "content_sha256"))

    // genuinely-new docs only: replay/re-ingest of a known doc_id must not
    // duplicate state rows. Both anti-joins below are phrased as "prune the
    // O(corpus) accumulated side down to the batch's hits first" — the
    // accumulated side is never the broadcast candidate and never enters an
    // exchange (scan+filter), same discipline as the band-probe prune.
    // t1New is PERSISTED rather than round-tripped through a scratch parquet
    // table (an earlier design wrote + re-read `incoming_t1` every batch —
    // two extra jobs on the fixed per-batch floor for the same
    // materialize-once effect the cache gives).
    val t1Raw = graft.ingest.Ingest.ingest(corpusBatch)
      .select("doc_id", "repo", "lang", "content_sha256", "content")
      .dropDuplicates("doc_id")
      .persist()
    // nRaw is the ONE count that must exist before any prune plan is built:
    // it upper-bounds every broadcast-vs-shuffle decision below (nNew ≤
    // nRaw, and a bound only gates broadcastability — using the looser raw
    // count never changes emitted rows, it can only fall back to a shuffle
    // semi-join sooner). Counting t1Raw unconditionally (the first batch
    // included) also materializes the cache every chain reads.
    val nRaw = timed("nRaw.count")(t1Raw.count())
    val t1New = docsOld match {
      case Some(old) =>
        val oldIdHit = semiPrune(old.select("doc_id"),
          t1Raw.select("doc_id"), Seq("doc_id"), nRaw)
        antiPrune(t1Raw, oldIdHit, Seq("doc_id"), nRaw).persist()
      case None => t1Raw
    }

    // the write materializes the t1New cache (its attached observation is
    // the batch's exact doc count, recorded in lineage); running it BEFORE
    // the concurrent chains keeps their first actions from racing to
    // compute t1New's prune subtree 3–4× in parallel — duplicated upstream
    // shuffle reads that the flat-shuffle guarantee (StreamingSpec) counts
    val nNew = timed("docs.write")(writeCounted(t1New.select("doc_id", "content_sha256"),
      s"$stateDir/docs/batch=$id"))

    // First carrier per previously-unseen sha (min doc_id within the batch)
    // — the only docs that enter LSH/suffix state. Docs whose sha is already
    // known contribute exact-star edges only, exactly like the batch
    // pipeline's members.
    val newShaDocs = docsOld match {
      case Some(old) =>
        val oldShaHit = semiPrune(old.select("content_sha256"),
          t1New.select("content_sha256").distinct(), Seq("content_sha256"), nRaw)
          .distinct()
        antiPrune(t1New, oldShaHit, Seq("content_sha256"), nRaw)
      case None => t1New
    }
    // persisted: the LSH chain (signatures) and the suffix chain (tokens)
    // both start from the reps — without the cache each chain re-runs the
    // sha-group shuffle. The chains race to materialize it; a partition
    // computed twice is cached once (Spark cache semantics), which costs at
    // most what the uncached design always paid.
    val repsNew = newShaDocs.join(
      newShaDocs.groupBy("content_sha256").agg(min("doc_id").as("doc_id")),
      Seq("content_sha256", "doc_id"))
      .persist()
    // materialize ONCE before the chains fork: the four chain-head jobs
    // (signature/band/token/gram writes) all read repsNew, and cold racers
    // would each re-run its sha-group shuffle (the duplicated shuffle reads
    // would also be charged against StreamingSpec's flat-shuffle budget)
    timed("reps.count")(repsNew.count()): Unit

    // The three state-building chains are INDEPENDENT until the commit
    // marker (disjoint tables: signatures/bands/band_counts/lsh_pairs vs
    // toks/grams/gram_counts/sfx_pairs vs exact_pairs) — run them
    // concurrently so their fixed per-job costs overlap (the measured
    // 8–10 s/batch floor was ~17 SEQUENTIAL driver-coordinated jobs).
    val results = inParallel(spark.sparkContext, Seq[(String, () => Long)](
      "lsh" -> (() => { lshIncrement(spark, stateDir, repsNew, done, id, nRaw, cfg); 0L }),
      "suffix" -> (() => suffixIncrement(spark, stateDir, repsNew, done, id, cfg, collectStats)),
      "exact" -> (() => { exactIncrement(spark, stateDir, t1New, docsOld, nRaw, id); 0L })
    ))
    val newSfxPairs = results(1)
    if (t1New ne t1Raw) t1Raw.unpersist(blocking = false)
    repsNew.unpersist(blocking = false)
    if (t1New ne t1Raw) t1New.unpersist(blocking = false)
    else t1Raw.unpersist(blocking = false)

    val newPairCount =
      if (!collectStats) -1L
      else spark.read.parquet(s"$stateDir/lsh_pairs/batch=$id").select("a", "b")
        .unionByName(spark.read.parquet(s"$stateDir/exact_pairs/batch=$id"))
        .distinct().count()

    commit(spark, stateDir, id)
    timed("lineage")(recordBatchLineage(spark, stateDir, s"batch=$id", s"incr-$id", cfg.fingerprint,
      (System.nanoTime() - tBatch0) / 1000000L, docRows = nNew))
    val totalDocs =
      if (!collectStats) -1L
      else readState(spark, stateDir, "docs", done, alsoBatch = id)
        .map(_.count()).getOrElse(0L)
    BatchResult(newPairCount, totalDocs, newSfxPairs)
  }

  /** LSH chain of one micro-batch: sign + band the new reps, append their
    * signature/band/band-count partitions, generate candidates against the
    * pruned accumulated band state under the running stop cap, verify, and
    * append the verified pairs with (band, band_hash) provenance. Tables
    * touched: `signatures`, `bands`, `band_counts`, `lsh_pairs` — disjoint
    * from the suffix and exact chains, so processBatch runs the three
    * concurrently.
    *
    * Execution strategy (round 6; state rows unchanged): the band-count
    * write no longer serializes the candidate path — the prune plans read
    * `committed count partitions ∪ a recount of the just-written band
    * partition` (row-identical: grams/bands are written before their
    * counts are consumed, and the recount is the same aggregation the
    * write runs), so the counts write runs CONCURRENTLY with the
    * candidate→verify→pair-write path. All intermediates stay
    * parquet-backed: an earlier attempt to cache them instead broke
    * exchange reuse inside the prune plans (each broadcast build
    * recomputed the whole upstream pipeline — per-batch shuffle 2.6×) and
    * starved the planner of size estimates. Together with the
    * band-derivation from the signature PLAN below (the two state writes
    * overlap), the chain's critical path is 5 serial jobs → 3
    * (max(sigs, bands) write → prov count → pair write).
    */
  private def lshIncrement(spark: SparkSession, stateDir: String,
      repsNew: DataFrame, done: Seq[Long], id: Long, nNew: Long,
      cfg: DedupConfig): Unit = {
    val sigsNew = DedupPipeline.signatures(spark, repsNew, cfg)
    // bands derive from the signature PLAN, not the written partition: the
    // kernel re-runs over the already-materialized repsNew cache (batch-
    // sized — trivial), which lets the two append-only state writes
    // overlap instead of serializing on a write→read-back. Rows are
    // identical (deterministic kernel); the candidate path below reads
    // the written parquet as before (clean scans keep exchange reuse and
    // size estimates intact — see the chain scaladoc).
    val bandsNew = graft.lsh.Banding.bandRows(sigsNew, cfg)
    inParallel(spark.sparkContext, Seq[(String, () => Unit)](
      "sigs.write" -> (() => timed("sigs.write")(sigsNew
        .write.mode("overwrite").parquet(s"$stateDir/signatures/batch=$id"))),
      "bands.write" -> (() => timed("bands.write")(bandsNew
        .write.mode("overwrite").parquet(s"$stateDir/bands/batch=$id")))))
    val bandsNewD = spark.read.parquet(s"$stateDir/bands/batch=$id")
    val bcNew = bandsNewD.groupBy("band", "band_hash").agg(count(lit(1)).as("cnt"))

    inParallel(spark.sparkContext, Seq[(String, () => Unit)](
      // running band counts: this batch's per-key counts land in their own
      // append-only partition, exactly like bands/signatures
      "bcounts.write" -> (() => timed("bcounts.write")(bcNew
        .write.mode("overwrite").parquet(s"$stateDir/band_counts/batch=$id"))),
      "lsh.pairs" -> (() => {
        val bandsAll = readState(spark, stateDir, "bands", done, alsoBatch = id).get
          .select("band", "band_hash", "doc_id")
        val sigsAll = readState(spark, stateDir, "signatures", done, alsoBatch = id).get
          .select("doc_id", "minhash", "simhash")
        // committed counts ∪ recount of the written band partition — the
        // counts write above need not finish before this plan runs
        val countsAll = readState(spark, stateDir, "band_counts", done) match {
          case Some(old) => old.select("band", "band_hash", "cnt")
            .unionByName(bcNew.select("band", "band_hash", "cnt"))
          case None => bcNew.select("band", "band_hash", "cnt")
        }

        // Probe-side prune + running stop-band cap (see scaladoc).
        // nBandKeys bounds the distinct-key row count of every pruned side.
        val nBandKeys = nNew * (cfg.bands + cfg.simhashBlocks)
        val newKeys = bandsNewD.select("band", "band_hash").distinct()
        val hotKeys = semiPrune(countsAll, newKeys, Seq("band", "band_hash"), nBandKeys)
          .groupBy("band", "band_hash").agg(sum("cnt").as("total"))
          .where(col("total") > cfg.stopBandSize)
          .select("band", "band_hash")
        val bandsNewKept = antiPrune(bandsNewD.select("band", "band_hash", "doc_id"),
          hotKeys, Seq("band", "band_hash"), nBandKeys)
        val bandsProbe = antiPrune(
          semiPrune(bandsAll, newKeys, Seq("band", "band_hash"), nBandKeys),
          hotKeys, Seq("band", "band_hash"), nBandKeys)

        // LSH candidates touching a new rep, WITH band provenance (the
        // read-time retroactive cap needs to know which bands emitted a
        // pair). Persisted: it feeds the verify join, the endpoint prune,
        // and the provenance write.
        val prov = bandsNewKept.select(col("band"), col("band_hash"), col("doc_id").as("n"))
          .join(bandsProbe.select(col("band"), col("band_hash"), col("doc_id").as("m")),
            Seq("band", "band_hash"))
          .where(col("n") =!= col("m"))
          .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"),
            col("band"), col("band_hash"))
          .distinct()
          .persist()
        val nProv = timed("lshprov.count")(prov.count())

        val lshCands = graft.lsh.CandidatePairs.strongest(
          prov.select(col("a"), col("b"),
            when(col("band") < cfg.bands, "minhash").otherwise("simhash").as("src")))

        // verify against endpoint-pruned signatures: candidates touch
        // ≤ 2·|prov| docs, so the O(corpus) signature state stays out of
        // the verify joins
        val ends = prov.select(col("a").as("doc_id"))
          .unionByName(prov.select(col("b").as("doc_id"))).distinct()
        val sigsCand = semiPrune(sigsAll, ends, Seq("doc_id"), 2 * nProv)
        val verifiedLsh = graft.verify.Verifier.verifyLshPairs(lshCands, sigsCand, cfg)

        timed("lshpairs.write")(prov.join(verifiedLsh.select("a", "b", "est_jaccard", "src"), Seq("a", "b"))
          .write.mode("overwrite").parquet(s"$stateDir/lsh_pairs/batch=$id"))
        prov.unpersist(blocking = false)
      })))
  }

  /** Exact-dup chain of one micro-batch: within-batch star + one cross-batch
    * glue edge per sha (see the object scaladoc — O(k) edges per sha group,
    * never a new×all-old join). Touches only `exact_pairs`.
    */
  private def exactIncrement(spark: SparkSession, stateDir: String,
      t1New: DataFrame, docsOld: Option[DataFrame], nNew: Long, id: Long): Unit = {
    val newMin = t1New.groupBy("content_sha256").agg(min("doc_id").as("nm"))
    val withinBatch = t1New.select(col("content_sha256"), col("doc_id"))
      .join(newMin, "content_sha256")
      .where(col("doc_id") =!= col("nm"))
      .select(col("nm").as("a"), col("doc_id").as("b"))
    val glue = docsOld match {
      case Some(old) =>
        val prevReps = semiPrune(old, newMin.select("content_sha256"),
            Seq("content_sha256"), nNew)
          .groupBy("content_sha256").agg(min("doc_id").as("pr"))
        newMin.join(prevReps, "content_sha256")
          .select(least(col("nm"), col("pr")).as("a"), greatest(col("nm"), col("pr")).as("b"))
      case None => withinBatch.limit(0)
    }
    timed("exact.write")(withinBatch.unionByName(glue)
      .write.mode("overwrite").parquet(s"$stateDir/exact_pairs/batch=$id"))
  }

  /** One lineage row per state table per committed batch / compaction
    * generation (north rule: "checkpoint every stage ... with per-partition
    * lineage and metrics") — appended to `stage_meta` in the
    * [[graft.io.StageMeta.MetaRow]] schema so the batch CLI's lineage
    * readers work unchanged on a stream's state dir. Byte sizes come from
    * the FS listing (free); the row count is recorded where the batch
    * already knows it (`docs`) and left NULL otherwise — deliberately no
    * extra count jobs on the per-batch hot path, whose measured 8–10 s
    * fixed cost is driver-action-bound.
    */
  private def recordBatchLineage(spark: SparkSession, stateDir: String,
      partition: String, runId: String, fingerprint: String, wallMs: Long,
      docRows: Long): Unit = {
    val f = fs(spark, stateDir)
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val rows = StateTables.flatMap { t =>
      val p = new Path(s"$stateDir/$t/$partition")
      if (!f.exists(p)) None
      else Some(graft.io.StageMeta.MetaRow(runId, t, partition,
        if (t == "docs" && docRows >= 0) Some(docRows) else None,
        f.getContentSummary(p).getLength, fingerprint, wallMs, now))
    }
    if (rows.nonEmpty)
      spark.createDataFrame(rows).write.mode("append").parquet(s"$stateDir/stage_meta")
  }

  /** Incremental suffix/containment pass (scaladoc above): tokenize the new
    * sha-rep docs, append their token streams / minLen-gram index /
    * per-gram counts as batch partitions, generate candidates new×all over
    * grams under the RUNNING df-cap (pruned probe side, like the band
    * join), verify with the per-pair suffix-array kernel, and append the
    * verified pairs WITH anchor-gram provenance — the read side ([[edges]])
    * applies the final retroactive cap.
    *
    * @return number of verified suffix pair rows appended for this batch
    */
  private def suffixIncrement(spark: SparkSession, stateDir: String,
      repsNew: DataFrame, done: Seq[Long], id: Long,
      cfg: DedupConfig, collectStats: Boolean = true): Long = {
    import spark.implicits._
    val minLen = cfg.suffixMinLen

    // Round-6 execution strategy (state rows unchanged, mirrors
    // lshIncrement): the gram-count write no longer serializes the
    // candidate path — the prune plans read `committed count partitions ∪
    // a recount of the just-written gram partition` and run CONCURRENTLY
    // with the counts write. Intermediates stay parquet-backed (see
    // lshIncrement: cached intermediates broke exchange reuse in the prune
    // plans and starved the planner of size estimates).
    val toksNew = graft.suffix.SuffixPass.tokenDocs(spark, repsNew, cfg)
      .filter(_.tokens.length >= minLen) // can't hold a minLen run otherwise
      .toDF()
    // grams derive from the token PLAN, not the written partition (mirrors
    // the LSH chain: the tokenize re-runs over the materialized repsNew
    // cache, letting the two state writes overlap). The gram-key volume
    // bound rides the gram write's observation (grams scale with TOKENS,
    // not docs, so a doc bound would be wildly wrong here — and a
    // follow-up count job is a job the fixed floor can't spare).
    val gramsNew =
      toksNew.select(col("doc_id"), col("tokens")).as[(Long, Array[Long])]
        .flatMap { case (d, tk) =>
          graft.suffix.SuffixPass.indexFps(tk, cfg).map(fp => (fp, d))
        }
        .toDF("fp", "doc_id")
    val nGramRows = inParallel(spark.sparkContext, Seq[(String, () => Long)](
      "toks.write" -> (() => { timed("toks.write")(toksNew
        .write.mode("overwrite").parquet(s"$stateDir/toks/batch=$id")); 0L }),
      "grams.write" -> (() => timed("grams.write")(
        writeCounted(gramsNew, s"$stateDir/grams/batch=$id")))))(1)
    val gramsNewD = spark.read.parquet(s"$stateDir/grams/batch=$id")
    // grams() emits distinct fps per doc, so count(*) = docs-per-gram
    val gcNew = gramsNewD.groupBy("fp").agg(count(lit(1)).as("cnt"))

    inParallel(spark.sparkContext, Seq[(String, () => Long)](
      "gcounts.write" -> (() => { timed("gcounts.write")(gcNew
        .write.mode("overwrite").parquet(s"$stateDir/gram_counts/batch=$id")); 0L }),
      "sfx.pairs" -> (() => {
        // committed counts ∪ recount of the written gram partition — the
        // counts write above need not finish before this plan runs
        val gcountsAll = readState(spark, stateDir, "gram_counts", done) match {
          case Some(old) => old.select("fp", "cnt").unionByName(gcNew.select("fp", "cnt"))
          case None => gcNew.select("fp", "cnt")
        }
        val newFps = gramsNewD.select("fp").distinct()
        val hotFps = semiPrune(gcountsAll, newFps, Seq("fp"), nGramRows)
          .groupBy("fp").agg(sum("cnt").as("total"))
          .where(col("total") > cfg.suffixDfMax)
          .select("fp")
        val gramsNewKept = antiPrune(gramsNewD, hotFps, Seq("fp"), nGramRows)
        val gramsProbe = antiPrune(
          semiPrune(readState(spark, stateDir, "grams", done, alsoBatch = id).get,
            newFps, Seq("fp"), nGramRows),
          hotFps, Seq("fp"), nGramRows)

        // candidate pairs WITH anchor-gram provenance (read-time cap needs
        // it); persisted — it feeds the endpoint prune, the verify join and
        // the provenance write, and its count bounds the broadcast decision
        val prov = gramsNewKept.select(col("fp"), col("doc_id").as("n"))
          .join(gramsProbe.select(col("fp"), col("doc_id").as("m")), Seq("fp"))
          .where(col("n") =!= col("m"))
          .select(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"), col("fp"))
          .distinct()
          .persist()
        val nProv = timed("sfxprov.count")(prov.count())

        // verify each distinct pair once; token streams attach
        // endpoint-pruned (guarded — a boilerplate-heavy batch can push the
        // candidate endpoint set past any safe broadcast size)
        val candPairs = prov.select("a", "b").distinct()
        val ends = candPairs.select(col("a").as("doc_id"))
          .unionByName(candPairs.select(col("b").as("doc_id"))).distinct()
        val toksCand = semiPrune(
          readState(spark, stateDir, "toks", done, alsoBatch = id).get,
          ends, Seq("doc_id"), 2 * nProv)
        val verifiedSfx = candPairs
          .join(toksCand.select(col("doc_id").as("a"), col("tokens").as("ta")), "a")
          .join(toksCand.select(col("doc_id").as("b"), col("tokens").as("tb")), "b")
          .select(col("a"), col("b"), col("ta"), col("tb"))
          .as[(Long, Long, Array[Long], Array[Long])]
          .mapPartitions(_.flatMap { case (a, b, tA, tB) =>
            // same exact O(n) decision as the batch pass (SA only as the
            // hash-collision fallback arbiter)
            if (graft.suffix.SuffixArrays.commonRunAtLeast(tA, tB, minLen) >= minLen) Some((a, b))
            else None
          })
          .toDF("a", "b")

        timed("sfxpairs.write")(prov.join(verifiedSfx, Seq("a", "b"), "left_semi")
          .write.mode("overwrite").parquet(s"$stateDir/sfx_pairs/batch=$id"))
        prov.unpersist(blocking = false)
        if (!collectStats) -1L
        else spark.read.parquet(s"$stateDir/sfx_pairs/batch=$id")
          .select("a", "b").distinct().count()
      })))(1)
  }

  private val StateTables = Seq("docs", "signatures", "bands", "band_counts",
    "toks", "grams", "gram_counts", "lsh_pairs", "exact_pairs", "sfx_pairs")

  /** Compact the committed state into one generational base partition per
    * table, bounding partition/file count over a long stream (thousands of
    * micro-batches otherwise mean thousands of tiny partitions per table —
    * the per-batch O(corpus) state read pays their listing + open overhead
    * every batch). Semantics-preserving by construction: every table is the
    * plain union of the partitions it replaces, except the count tables,
    * which re-aggregate to one row per key (sum is associative — the
    * retroactive cap filters see identical totals).
    *
    * Crash-safe without any rewrite-in-place: the union is written to a
    * FRESH dir `batch=-<gen>` (never overwriting live state), then a single
    * atomic marker create (`_commits/base-<gen>-<upto>`) flips readers over;
    * superseded partitions and markers are deleted lazily AFTER the marker
    * is durable. A crash before the marker leaves an orphan dir that the
    * next compaction overwrites; a crash mid-cleanup leaves garbage that
    * readers already ignore and the next compaction's cleanup removes.
    *
    * Streaming-replay safety: the NEWEST committed regular batch is never
    * compacted away (exclusion in the impl) — a restart that replays the
    * latest epoch (engine marker durable, streaming checkpoint commit lost)
    * finds its marker live and no-ops. A replay of a genuinely superseded
    * id — only possible with a recreated/foreign checkpoint pointed at an
    * old compacted state dir — fails loudly in [[processBatch]] rather than
    * silently committing into a partition no reader would ever include.
    *
    * Run between batches (same single-writer discipline as processBatch);
    * a typical cadence is every N micro-batches or on a size trigger.
    */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    compactStateImpl(spark, stateDir, failBeforeMarker = false)

  private[graft] def compactStateImpl(spark: SparkSession, stateDir: String,
      failBeforeMarker: Boolean): Unit = {
    val tComp0 = System.nanoTime()
    val markers = commitMarkers(spark, stateDir)
    val base = baseInfo(markers)
    // The NEWEST committed regular batch is excluded from compaction: a
    // Structured Streaming restart can legitimately replay the LATEST epoch
    // (the engine's commit marker became durable, then the crash ate the
    // streaming checkpoint's own epoch commit) — that id must still resolve
    // to a live committed batch so processBatch short-circuits the replay,
    // instead of crash-looping forever on the superseded-id guard. Older
    // epochs cannot replay this way (the checkpoint commits epoch N before
    // starting N+1), so compacting them away stays safe.
    val regsAll = regularIds(markers).filter(id => base.forall(id > _.upto)).sorted
    val regs = regsAll.dropRight(1)
    if (regs.size + base.size <= 1) return // nothing to merge
    val ids = base.map(b => -b.gen).toSeq ++ regs
    val gen = base.map(_.gen).getOrElse(0L) + 1L
    val upto = regs.max

    // stage the unions OUTSIDE the table roots (Spark refuses to overwrite
    // a path it is reading), then rename each into place — rename is cheap
    // (same fs) and the target dirs are fresh, so nothing live is touched
    // before the marker flip
    val f = fs(spark, stateDir)
    val tmpRoot = s"$stateDir/_compact_tmp"
    f.delete(new Path(tmpRoot), true)
    // one staging write per table, all independent → overlap their fixed
    // job costs (same lever as processBatch's concurrent chains)
    inParallel(spark.sparkContext, StateTables.map { t => t -> { () =>
      readState(spark, stateDir, t, ids).foreach { df =>
        val merged = t match {
          case "band_counts" =>
            df.groupBy("band", "band_hash").agg(sum("cnt").as("cnt"))
          case "gram_counts" =>
            df.groupBy("fp").agg(sum("cnt").as("cnt"))
          case _ => df.drop("batch") // partition-discovery column
        }
        merged.write.mode("overwrite").parquet(s"$tmpRoot/$t")
      }
    }})
    if (failBeforeMarker) return
    StateTables.foreach { t =>
      val staged = new Path(s"$tmpRoot/$t")
      if (f.exists(staged)) {
        val target = new Path(s"$stateDir/$t/batch=-$gen")
        f.delete(target, true) // orphan from a crashed earlier attempt
        // rename returns false instead of throwing on several fs failure
        // modes; proceeding to the marker without the table would let the
        // cleanup below delete the only copy of its rows
        require(f.rename(staged, target),
          s"compaction rename failed for $t — aborting before the marker flip")
      }
    }
    f.create(new Path(s"$stateDir/_commits/base-$gen-$upto"), true).close()
    f.delete(new Path(tmpRoot), true)
    recordBatchLineage(spark, stateDir, s"batch=-$gen", s"incr-compact-$gen",
      s"compact-upto-$upto", (System.nanoTime() - tComp0) / 1000000L, docRows = -1L)

    // Cleanup sweeps EVERYTHING the new base supersedes — not just this
    // run's `regs`/`base` lists — so orphans from a previous crash
    // mid-cleanup are also removed (a partition is live iff its id is the
    // new base or a regular id > upto; regular ids ≤ upto and older bases
    // are dead by the marker's definition, even half-deleted ones).
    def dead(idStr: String): Boolean =
      idStr.toLongOption.exists(i => if (i < 0) i != -gen else i <= upto)
    StateTables.foreach { t =>
      val root = new Path(s"$stateDir/$t")
      if (f.exists(root)) f.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=") && dead(n.stripPrefix("batch=")))
          f.delete(st.getPath, true)
      }
    }
    commitMarkers(spark, stateDir).foreach {
      case m if m.startsWith("batch-") && dead(m.stripPrefix("batch-")) =>
        f.delete(new Path(s"$stateDir/_commits/$m"), false)
      case m if m.startsWith("base-") && m != s"base-$gen-$upto" =>
        f.delete(new Path(s"$stateDir/_commits/$m"), false)
      case _ => ()
    }
    ()
  }

  /** Verified LSH pairs still live under the FINAL stop-band cap: a pair
    * survives iff ≥1 of its emitting (band, band_hash) keys has accumulated
    * count ≤ stopBandSize (retroactive batch semantics — see scaladoc).
    */
  def liveLshPairs(spark: SparkSession, stateDir: String,
      cfg: DedupConfig = DedupConfig.default): DataFrame =
    liveLshPairsOf(spark, stateDir, cfg, committedIds(spark, stateDir))

  private def liveLshPairsOf(spark: SparkSession, stateDir: String,
      cfg: DedupConfig, committed: Seq[Long]): DataFrame =
    (readState(spark, stateDir, "lsh_pairs", committed),
      readState(spark, stateDir, "band_counts", committed)) match {
      case (Some(lsh), Some(counts)) =>
        val hot = counts.groupBy("band", "band_hash").agg(sum("cnt").as("total"))
          .where(col("total") > cfg.stopBandSize)
          .select("band", "band_hash")
        lsh.join(hot, Seq("band", "band_hash"), "left_anti")
          .select("a", "b").distinct()
      case _ => emptyPairs(spark)
    }

  /** Verified suffix pairs still live under the FINAL gram df-cap. */
  def liveSuffixPairs(spark: SparkSession, stateDir: String,
      cfg: DedupConfig = DedupConfig.default): DataFrame =
    liveSuffixPairsOf(spark, stateDir, cfg, committedIds(spark, stateDir))

  private def liveSuffixPairsOf(spark: SparkSession, stateDir: String,
      cfg: DedupConfig, committed: Seq[Long]): DataFrame =
    (readState(spark, stateDir, "sfx_pairs", committed),
      readState(spark, stateDir, "gram_counts", committed)) match {
      case (Some(sfx), Some(counts)) =>
        val hot = counts.groupBy("fp").agg(sum("cnt").as("total"))
          .where(col("total") > cfg.suffixDfMax)
          .select("fp")
        sfx.join(hot, Seq("fp"), "left_anti").select("a", "b").distinct()
      case _ => emptyPairs(spark)
    }

  /** Accumulated exact-duplicate edges (within-batch stars + glue edges). */
  def exactEdges(spark: SparkSession, stateDir: String): DataFrame =
    exactEdgesOf(spark, stateDir, committedIds(spark, stateDir))

  private def exactEdgesOf(spark: SparkSession, stateDir: String,
      committed: Seq[Long]): DataFrame =
    readState(spark, stateDir, "exact_pairs", committed)
      .map(_.select("a", "b")).getOrElse(emptyPairs(spark))

  private def emptyPairs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("a", "b")
  }

  /** The composed live edge set: retroactively-capped LSH pairs ∪ exact
    * edges ∪ retroactively-capped suffix pairs (committed batches only).
    * The commit-marker listing happens once per call, not once per branch.
    */
  def edges(spark: SparkSession, stateDir: String,
      cfg: DedupConfig = DedupConfig.default): DataFrame =
    edgesOf(spark, stateDir, cfg, committedIds(spark, stateDir))

  private def edgesOf(spark: SparkSession, stateDir: String,
      cfg: DedupConfig, committed: Seq[Long]): DataFrame =
    liveLshPairsOf(spark, stateDir, cfg, committed)
      .unionByName(exactEdgesOf(spark, stateDir, committed))
      .unionByName(liveSuffixPairsOf(spark, stateDir, cfg, committed))
      .distinct()

  /** Final clusters over the accumulated live edge set (committed state
    * only).
    */
  def clusters(spark: SparkSession, stateDir: String,
      cfg: DedupConfig = DedupConfig.default): DataFrame = {
    val committed = committedIds(spark, stateDir)
    val docs = readState(spark, stateDir, "docs", committed)
      .map(_.select("doc_id")).getOrElse(spark.emptyDataFrame.withColumn("doc_id", lit(0L)))
    val mapping = graft.cc.ConnectedComponents.run(spark,
      edgesOf(spark, stateDir, cfg, committed))
    graft.cc.ConnectedComponents.assignAll(docs, mapping)
  }

  /** Streaming entry: parquet file stream → foreachBatch incremental, with
    * the engine's batch id threaded through for replay detection.
    *
    * @param maxFilesPerTrigger bound files per micro-batch (None = Spark
    *        default, all available) — lets tests drive one epoch per file
    * @param onBatchDone test seam invoked AFTER the engine commit marker is
    *        durable but BEFORE the streaming checkpoint commits the epoch;
    *        throwing here reproduces exactly the crash window the
    *        latest-epoch replay guarantee covers (see [[compactState]])
    */
  def startStream(
      spark: SparkSession,
      inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String,
      cfg: DedupConfig = DedupConfig.default,
      maxFilesPerTrigger: Option[Int] = None,
      onBatchDone: Long => Unit = _ => ()): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(spark, batch, stateDir, cfg, id)
        onBatchDone(id)
      }
      .option("checkpointLocation", s"$stateDir/_stream_checkpoint")
      .start()
  }
}
