package graft.verify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig

/** T5 → T6 pair verification (SURVEY.md §2 rows 23–26).
  *
  * Two equi hash joins attach both signatures, then verification is pure
  * codegen'd column arithmetic:
  *  - est_jaccard = fraction of equal MinHash lanes (MMDS 3.3.5) via
  *    `zip_with` + `filter` + `size` — no UDF;
  *  - Hamming distance via `bit_count(simhash_a ^ simhash_b)` (Manku WWW'07).
  *
  * A pair survives if est_jaccard ≥ τ OR hamming ≤ hammingMax. `exact` and
  * `suffix` pairs are verified by construction upstream and bypass this.
  */
object Verifier {

  def verifyLshPairs(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val sa = sigs.select(col("doc_id").as("a"), col("minhash").as("mh_a"), col("simhash").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("b"), col("minhash").as("mh_b"), col("simhash").as("sh_b"))
    pairs
      .join(sa, "a")
      .join(sb, "b")
      .withColumn("est_jaccard",
        graft.functions.LongArrayEqualCount.equalLaneCount(col("mh_a"), col("mh_b"))
          / lit(cfg.numPerms.toDouble))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("est_jaccard") >= cfg.jaccardTau || col("hamming") <= cfg.hammingMax)
      .select(col("a"), col("b"), col("est_jaccard"), col("src"))
  }

  /** Exact Jaccard on shingle arrays — test/calibration only (row 25). */
  def exactJaccard(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    val sa = shingled.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))))
      .select("a", "b", "jaccard")
  }
}
