package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T0 → T1 ingest (SURVEY.md §2 rows 1, 6, 7).
  *
  * `doc_id` is a *deterministic* key — xxhash64(repo, path, commit) — never
  * `monotonically_increasing_id`, so identical inputs yield identical ids
  * across runs/partitionings (resume + fixture equality depend on it).
  * `content_sha256` is the per-row invariant demanded by the input hint.
  */
object Ingest {

  val CorpusCols: Seq[String] = Seq("repo", "path", "commit", "lang", "content")

  /** Map the driver's `documents.parquet` onto the canonical corpus schema
    * (FIXTURES.md §4): repo←source, path←'doc/'||doc_id, commit←'v0'.
    */
  def corpusFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    documentsToCorpus(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** The canonical documents→corpus projection, exposed so callers that
    * pre-filter the documents table (e.g. the incremental driver queries'
    * doc_id%k batch slices) share ONE definition — engine doc_ids are
    * xxhash64 over exactly these columns, and a silently drifted duplicate
    * projection would make the incr oracles' relabel join drop every row.
    */
  def documentsToCorpus(docs: DataFrame): DataFrame =
    docs.select(
      col("source").as("repo"),
      concat(lit("doc/"), col("doc_id")).as("path"),
      lit("v0").as("commit"),
      col("lang"),
      col("text").as("content"))

  /** T1: stable ids + per-row invariants. Pure projection — stays inside
    * whole-stage codegen and pushes column pruning into the scan.
    */
  def ingest(corpus: DataFrame): DataFrame =
    corpus.select(
      xxhash64(col("repo"), col("path"), col("commit")).as("doc_id"),
      col("repo"), col("path"), col("commit"), col("lang"),
      sha2(col("content"), 256).as("content_sha256"),
      // octet_length (UTF-8 bytes), not length (chars): the 10MB filter cap
      // is a byte budget and multi-byte content must not under-measure
      octet_length(col("content")).cast("long").as("n_bytes"),
      col("content"))

  /** Corpus hygiene filter (row 7): language allow-list, size bounds,
    * vendored-path exclusion. All predicates are Catalyst built-ins so they
    * push down to the scan.
    */
  def corpusFilter(
      t1: DataFrame,
      langs: Seq[String] = Nil,
      minBytes: Long = 1L,
      maxBytes: Long = 10L * 1024 * 1024,
      vendorRx: String = "(^|/)(vendor|node_modules|third_party|\\.git)/"): DataFrame = {
    val base = t1
      .where(col("n_bytes").between(minBytes, maxBytes))
      .where(!col("path").rlike(vendorRx))
    if (langs.isEmpty) base else base.where(col("lang").isin(langs: _*))
  }
}
