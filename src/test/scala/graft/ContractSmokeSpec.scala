package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() rows > 0 on sf0.001; every oracleSql key
  * exists in queries; every query runs on sf0.001.
  */
class ContractSmokeSpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("every query runs non-empty on sf0.001 (except group/pair queries that may legitimately be small)") {
    val mayBeEmpty = Set("exact_dup_groups", "q_set_except", "q_anti_join", "dedup_candidate_pairs")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (!mayBeEmpty(name)) assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
