package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.conf.DedupConfig
import graft.extra.{Similarity, TextOps}
import graft.ingest.Ingest

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * extras) gets a `queries` entry; SQL-expressible ones also get a DuckDB
  * oracle in [[oracleSql]]. Column names are aligned 1:1 between the Spark
  * query and the oracle SQL (the driver's compare sorts columns by name).
  */
object SparkEntry {

  private val cfg = DedupConfig.default

  private def docsT1(spark: SparkSession, sfDir: String): DataFrame =
    Ingest.ingest(Ingest.corpusFromDocuments(spark, sfDir))
      // documents.parquet is a single small file = one scan partition;
      // spread so the typed kernels parallelize
      .repartition(spark.sparkContext.defaultParallelism * 2)

  private def pipeline(spark: SparkSession, sfDir: String): DedupPipeline.Result =
    DedupPipeline.run(spark, docsT1(spark, sfDir), cfg)

  /** Flagship: top duplicate clusters over the documents corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val res = pipeline(spark, "/root/testdata/sf0.001")
    res.clusterStats.orderBy(col("size").desc, col("cluster_id")).limit(100)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- near-dup pipeline stages (SURVEY §2.3-2.6; oracle = fixture tests) ----
    "dedup_clusters" -> ((s, d) => pipeline(s, d).clusters.orderBy("doc_id")),
    "dedup_cluster_stats" -> ((s, d) =>
      pipeline(s, d).clusterStats.orderBy(col("size").desc, col("cluster_id"))),
    "dedup_signatures" -> ((s, d) =>
      pipeline(s, d).signatures.select("doc_id", "simhash", "n_shingles").orderBy("doc_id")),
    "dedup_bands" -> ((s, d) => pipeline(s, d).bands.orderBy("doc_id", "band")),
    "dedup_candidate_pairs" -> ((s, d) =>
      pipeline(s, d).candidatePairs.orderBy("a", "b")),

    // ---- corpus hygiene filter (SURVEY §2 row 7, Q/sql) ----
    "corpus_filter" -> ((s, d) =>
      Ingest.corpusFilter(docsT1(s, d), langs = Seq("en"), minBytes = 100, maxBytes = 400)
        .select("path").orderBy("path")),

    // ---- exact Jaccard on shingle arrays (row 25) + capped members (row 36) ----
    "dedup_exact_jaccard" -> ((s, d) => {
      val t1d = DedupPipeline.distinctByContent(docsT1(s, d))
      val sh = DedupPipeline.shingled(s, t1d, cfg)
      val res = pipeline(s, d)
      verify.Verifier.exactJaccard(
        res.candidatePairs.where(col("src").isin("minhash", "simhash")), sh)
        .orderBy("a", "b")
    }),
    "cluster_members" -> ((s, d) =>
      pipeline(s, d).clusters
        .groupBy("cluster_id")
        .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 20).as("sample_members"),
          count(lit(1)).as("size"))
        .orderBy("cluster_id")),

    // ---- ingest / exact dedup (Q/sql) ----
    "doc_sha256" -> ((s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), sha2(col("text"), 256).as("sha"),
          length(col("text")).cast("long").as("len_chars"))
        .orderBy("doc_id")),
    "exact_dup_groups" -> ((s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .groupBy(sha2(col("text"), 256).as("sha"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("rep"))
        .where(col("cnt") > 1)
        .orderBy("sha")),

    // ---- text analysis (Q/sql) ----
    "text_token_counts" -> ((s, d) => TextOps.tokenCounts(s, d)),
    "text_quality" -> ((s, d) => TextOps.qualityScores(s, d)),
    "text_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "text_fingerprints" -> ((s, d) => TextOps.fingerprints(s, d)),

    // ---- embeddings / similarity ----
    "emb_dims" -> ((s, d) =>
      Similarity.embeddings(s, d)
        .select(col("vec_id"), size(col("embedding")).cast("long").as("dim"))
        .orderBy("vec_id")),
    "emb_profile" -> ((s, d) => Similarity.profile(s, d)),
    "ann_topk_brute" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "ann_topk_lsh" -> ((s, d) => Similarity.lshTopK(s, d)),
    "ann_topk_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "emb_dup_clusters" -> ((s, d) => Similarity.embeddingDupClusters(s, d)),

    // ---- multimodal binary-column plumbing (decode stubbed; rows-only) ----
    "mm_decode" -> ((s, d) =>
      extra.Multimodal.decode(s, extra.Multimodal.assets(s, d)).toDF().orderBy("asset_id")),
    "mm_features" -> ((s, d) =>
      extra.Multimodal.features(s, extra.Multimodal.assets(s, d)).toDF().orderBy("asset_id")),

    // ---- relational operator surface (SURVEY §2.7, all Q/sql) ----
    "q_agg_pricing" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q_filter_pushdown" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .where(col("l_shipdate") >= lit("1995-01-01") && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),
    "q_join_agg" -> ((s, d) => {
      val orders = s.read.parquet(s"$d/orders.parquet")
      val cust = s.read.parquet(s"$d/customer.parquet")
      val nation = s.read.parquet(s"$d/nation.parquet")
      orders.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .orderBy("n_name")
    }),
    "q_topk" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),
    "q_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.read.parquet(s"$d/orders.parquet")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),
    "q_semi_join" -> ((s, d) => {
      val cust = s.read.parquet(s"$d/customer.parquet")
      val orders = s.read.parquet(s"$d/orders.parquet")
      cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q_anti_join" -> ((s, d) => {
      val cust = s.read.parquet(s"$d/customer.parquet")
      val orders = s.read.parquet(s"$d/orders.parquet")
      // "no big-ticket order" — every customer has *some* order in this
      // data, so anti-join on the bare key would be vacuously empty.
      cust.join(orders.where(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q_distinct_agg" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("nd_cust"))
        .orderBy("o_orderstatus")),
    "q_set_except" -> ((s, d) => {
      val rich = s.read.parquet(s"$d/customer.parquet")
        .where(col("c_acctbal") > 9000).select(col("c_custkey"))
      val haveBig = s.read.parquet(s"$d/orders.parquet")
        .where(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      rich.except(haveBig).orderBy("c_custkey")
    }),
    "q_rollup" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"), col("n"))
        .orderBy("status", "prio")),
    "q_cube" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("sum_cents"))
        .orderBy("status", "prio")),
    "q_events_hourly" -> ((s, d) =>
      s.read.parquet(s"$d/events.parquet")
        // ts is TIMESTAMP_NTZ in the parquet: cast to session-TZ (UTC)
        // timestamp first, then to epoch seconds — matches DuckDB's epoch().
        .groupBy(window(col("ts"), "1 hour").getField("start")
          .cast("timestamp").cast("long").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
        .orderBy("hour_ts", "event_type")),
    "q_approx_distinct" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count(lit(1)).as("n"))),
  )

  def oracleSql: Map[String, String] = Map(
    "corpus_filter" ->
      "SELECT 'doc/' || doc_id AS path FROM documents WHERE lang = 'en' AND length(text) BETWEEN 100 AND 400 ORDER BY path",
    "doc_sha256" ->
      "SELECT doc_id, sha256(text) AS sha, length(text)::BIGINT AS len_chars FROM documents ORDER BY doc_id",
    "exact_dup_groups" ->
      "SELECT sha256(text) AS sha, count(*) AS cnt, min(doc_id) AS rep FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY sha",
    "text_token_counts" ->
      raw"SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_ws_tokens, len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))::BIGINT AS n_bpeish_tokens FROM documents ORDER BY doc_id",
    "text_quality" ->
      raw"SELECT doc_id, length(text)::BIGINT AS n_chars, round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text)::DOUBLE, 4) AS alpha_ratio, round(length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)::DOUBLE, 4) AS digit_ratio, round(length(regexp_replace(text, '[A-Za-z0-9_\s]', '', 'g')) / length(text)::DOUBLE, 4) AS punct_ratio, round(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','of','and','a','to','in','is','it','you','that','he','was','for','on','are','with','as','i','his','they'))) * 1.0 / len(regexp_split_to_array(trim(text), '\s+')), 4) AS stopword_ratio FROM documents ORDER BY doc_id",
    "emb_dims" ->
      "SELECT vec_id, len(embedding)::BIGINT AS dim FROM embeddings ORDER BY vec_id",
    "q_agg_pricing" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_price_cents FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2",
    "q_filter_pushdown" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 45 ORDER BY l_orderkey, l_linenumber",
    "q_join_agg" ->
      "SELECT n_name, count(*) AS n_orders, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1",
    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "q_window_rank" ->
      "SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn",
    "q_semi_join" ->
      "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey",
    "q_anti_join" ->
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) ORDER BY c_custkey",
    "q_distinct_agg" ->
      "SELECT o_orderstatus, count(DISTINCT o_custkey) AS nd_cust FROM orders GROUP BY 1 ORDER BY 1",
    "q_set_except" ->
      "SELECT c_custkey FROM customer WHERE c_acctbal > 9000 EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000 ORDER BY c_custkey",
    "q_rollup" ->
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ORDER BY status, prio",
    "q_events_hourly" ->
      "SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS hour_ts, event_type, count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_cents FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    "q_cube" ->
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY status, prio",
  )
}
