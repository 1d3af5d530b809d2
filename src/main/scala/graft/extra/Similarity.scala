package graft.extra

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / embedding similarity over the
  * `embeddings` table (vec_id:long, embedding:array<float>, label:int).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k of a small query set against
  *    the full table — broadcast the queries, score with `zip_with` +
  *    `aggregate` (codegen'd, no UDF), rank with a window. The baseline.
  *  - [[lshTopK]]: random-hyperplane (SimHash) bucketed variant — the scale
  *    path: sign-bit sketch per vector, candidates restricted to vectors
  *    sharing a bucket in ≥1 of `tables` block-indexes (Charikar STOC'02 /
  *    Manku WWW'07 block scheme), exact cosine only on candidates. At 100 TB
  *    the bucket join replaces the broadcast cross-product entirely.
  */
object Similarity {

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** vec_id, dim, norm — sanity profile of the embedding column. */
  def profile(spark: SparkSession, sfDir: String): DataFrame =
    embeddings(spark, sfDir).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("norm"))
      .orderBy("vec_id")

  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for the `nQueries` lowest vec_ids (deterministic
    * query set). Query side is tiny → `broadcast`; no shuffle on the corpus
    * side until the final per-query top-k (TakeOrdered via window+filter).
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val emb = embeddings(spark, sfDir)
    val queries = emb.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Sign-bit sketch: bit i = sign(dot(v, h_i)) for `nbits` pseudo-random
    * hyperplanes derived deterministically from (seed, i, dim index) — no
    * hyperplane matrix to ship, the expression IS the hyperplane.
    */
  def sketch(emb: DataFrame, nbits: Int = 16, seed: Int = 42): DataFrame = {
    // h_i[d] = ±1 from xxhash64(i, d, seed) sign — computed per element via
    // transform over the embedding with its index.
    val bits = (0 until nbits).map { i =>
      val dot = aggregate(
        zip_with(col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1),
            d => when(xxhash64(lit(i), d, lit(seed)) % 2 === 0, 1.0d).otherwise(-1.0d)),
          (x, h) => x.cast("double") * h),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    emb.withColumn("sketch", bits.reduce((a, b) => a + b))
  }

  /** LSH candidate top-k: vectors sharing any one of `tables` sketch blocks
    * collide; exact cosine + rank within candidates only.
    */
  def lshTopK(spark: SparkSession, sfDir: String, k: Int = 5, nQueries: Int = 20,
      nbits: Int = 16, tables: Int = 4): DataFrame = {
    val blockBits = nbits / tables
    val mask = (1L << blockBits) - 1
    val sk = sketch(embeddings(spark, sfDir), nbits)
    val blocks = sk.select(col("vec_id"), col("embedding"), col("sketch"),
      posexplode(array((0 until tables).map(t =>
        shiftrightunsigned(col("sketch"), t * blockBits).bitwiseAND(lit(mask))): _*)))
      .select(col("vec_id"), col("embedding"), col("pos").as("table"), col("col").as("bucket"))

    val qIds = sk.orderBy("vec_id").limit(nQueries).select(col("vec_id").as("query_id"))
    val qBlocks = blocks.join(broadcast(qIds), col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("qv"), col("table"), col("bucket"))

    val cands = blocks.join(qBlocks, Seq("table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")

    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cands.select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
