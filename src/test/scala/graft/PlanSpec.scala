package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.conf.DedupConfig
import graft.ingest.Ingest

/** Plan-quality regression gate: the physical plans that make the engine
  * scale must not silently degrade. Asserts on `executedPlan` strings —
  * pushdown reaching the parquet scan, column pruning, broadcast joins on
  * small dimensions, TakeOrderedAndProject for top-k, sort-merge join for
  * the salted pair self-join, and the slim parity prune ahead of the fat
  * verify join.
  */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q_filter_pushdown: predicates reach the scan, columns pruned") {
    val p = plan(SparkEntry.queries("q_filter_pushdown")(spark, d))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate"),
      "scan must read only the 4 referenced columns")
  }

  test("q_join_agg: both dimension joins broadcast") {
    val p = plan(SparkEntry.queries("q_join_agg")(spark, d))
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p.take(500))
  }

  test("q_join5_region: all four dimension joins broadcast, no shuffle join") {
    val p = plan(SparkEntry.queries("q_join5_region")(spark, d))
    assert(p.split("BroadcastHashJoin").length - 1 === 4)
    assert(!p.contains("SortMergeJoin"), "fact-side must never shuffle for a broadcastable dim")
  }

  test("q_topk plans TakeOrderedAndProject (no global sort)") {
    val p = plan(SparkEntry.queries("q_topk")(spark, d))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("pair self-join keys on the slim packed (bh, pk) pair; SMJ when not broadcastable") {
    val cfg = DedupConfig.default
    val t1 = Ingest.ingest(Ingest.corpusFromDocuments(spark, d))
    val sigs = DedupPipeline.signatures(spark, t1, cfg)
    val bands = lsh.Banding.bandRows(sigs, cfg)
    // tiny inputs legitimately broadcast; force the at-scale strategy
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (pairs, _) = lsh.CandidatePairs.generateJoin(spark, bands, cfg)
      val p = plan(pairs)
      assert(p.contains("SortMergeJoin [bh"), "pair generation should plan SMJ on bh/pk")
      assert(p.contains("pk"), "join key must be the packed band/i/j long")
      assert(!p.contains("SortAggregate"),
        "pair collapse must stay a HashAggregate (int priority, not min(string))")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("verify plans the slim parity prune before the fat array join") {
    val cfg = DedupConfig.default
    val t1 = Ingest.ingest(Ingest.corpusFromDocuments(spark, d))
    val sigs = DedupPipeline.signatures(spark, t1, cfg)
    val bands = lsh.Banding.bandRows(sigs, cfg)
    val (pairs, _) = lsh.CandidatePairs.generateJoin(spark, bands, cfg)
    val p = plan(verify.Verifier.verifyLshPairs(pairs, sigs, cfg))
    // slim prune: parity-word xor popcounts against the 128−90=38 budget
    assert(p.contains("bit_count((pa0"), "parity prune missing from the plan")
    assert(p.contains("longarrayequalcount"), "codegen'd est expression missing")
  }

  test("suffix pass: candidate/token checkpoints collapse the gram pipeline to one run") {
    // the candidate table feeds five subtrees (endpoint set ×2, pruned toks
    // via ta/tb ×2, verify join ×1); without the lazy localCheckpoints the
    // EXECUTED adaptive plan carried five fp-repartition exchanges — the
    // typed gram pipeline ran five times (measured: 46.7 GB shuffle at the
    // content-weighted shape). The final plan must read the checkpointed
    // RDDs instead of re-planning any gram shuffle.
    val cfg = DedupConfig.default
    val t1 = Ingest.ingest(Ingest.corpusFromDocuments(spark, d))
    val sfx = suffix.SuffixPass.containmentPairs(
      spark, DedupPipeline.distinctByContent(t1), cfg)
    sfx.count() // materialize so executedPlan is the final adaptive plan
    val p = plan(sfx)
    // the gram exchange is now byte-sized with an explicit partition count
    // (REPARTITION_BY_NUM origin) — assert neither spelling leaks
    assert(!p.contains("REPARTITION_BY_COL") && !p.contains("REPARTITION_BY_NUM"),
      "gram repartition leaked into the verify plan — candidate checkpoint lost")
    assert(p.contains("Scan ExistingRDD"), "checkpointed candidate/token scan missing")
  }
}
