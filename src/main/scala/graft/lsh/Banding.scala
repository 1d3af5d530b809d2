package graft.lsh

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig

/** T3 → T4 band slicing (SURVEY.md §2 rows 16–17). Pure DataFrame, pure
  * built-ins: the band-hash array is constant-folded per row and the
  * `posexplode` is a narrow ×(bands+blocks) expansion — no shuffle, stays in
  * whole-stage codegen.
  *
  * Band id space: 0..bands-1 = MinHash bands (band_hash = xxhash64(bandIdx,
  * 8-lane slice) — byte-identical to the kernel/oracle replica in
  * [[graft.Hashing.sparkXxhash64]]); bands..bands+simhashBlocks-1 = SimHash
  * blocks (band_hash = the raw 16-bit block value; pigeonhole over 4 blocks
  * covers Hamming ≤ 3 per Manku et al. WWW'07).
  *
  * Scale note (10^12 files): 16-bit SimHash block keys are too coarse alone —
  * production would key (block idx, block value, prefix of another block).
  * The group-size cap + salting in [[CandidatePairs]] is what keeps even
  * coarse keys safe.
  */
object Banding {

  /** Docs with zero shingles carry sentinel signatures and are excluded —
    * they can only be exact dups (handled by the sha256 path).
    */
  def bandRows(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val r = cfg.rowsPerBand
    val mhBands = (0 until cfg.bands).map { i =>
      xxhash64(lit(i), slice(col("minhash"), i * r + 1, r))
    }
    val mask = (1L << cfg.simhashBlockBits) - 1
    val shBands = (0 until cfg.simhashBlocks).map { i =>
      shiftrightunsigned(col("simhash"), i * cfg.simhashBlockBits).bitwiseAND(lit(mask))
    }
    sigs.where(col("n_shingles") > 0)
      .select(col("doc_id"), posexplode(array(mhBands ++ shBands: _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
  }
}
