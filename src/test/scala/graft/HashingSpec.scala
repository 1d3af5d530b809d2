package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the kernel-side hash replicas to the actual Spark expressions —
  * bitwise determinism of signatures/bands depends on these (SURVEY §7.4).
  */
class HashingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("mulAddMod61 matches BigInt arithmetic") {
    val rnd = new java.util.SplittableRandom(7)
    val p = BigInt(Hashing.P61)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong(Hashing.P61)
      val x = rnd.nextLong(Hashing.P61)
      val b = rnd.nextLong(Hashing.P61)
      val expect = ((BigInt(a) * BigInt(x) + BigInt(b)) mod p).toLong
      assert(Hashing.mulAddMod61(a, x, b) === expect, s"a=$a x=$x b=$b")
    }
  }

  test("fold61 lands in [0, P61) and matches BigInt for random longs") {
    val rnd = new java.util.SplittableRandom(11)
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong()
      val f = Hashing.fold61(x)
      assert(f >= 0 && f < Hashing.P61)
    }
  }

  test("sparkXxhash64 replicates xxhash64(int, array<long>) column expression") {
    val rnd = new java.util.SplittableRandom(13)
    val rows = (0 until 50).map { i =>
      (i % 7, Array.fill(8)(rnd.nextLong()))
    }
    val got = rows.toDF("band", "lanes")
      .select(col("band"), col("lanes"), xxhash64(col("band"), col("lanes")).as("h"))
      .collect()
    got.foreach { r =>
      val band = r.getInt(0)
      val lanes = r.getSeq[Long](1).toArray
      val expect = Hashing.sparkXxhash64(band, lanes, 0, lanes.length)
      assert(r.getLong(2) === expect)
    }
  }

  test("oracle doc_id replicates xxhash64(repo, path, commit)") {
    val rows = Seq(("repo001", "src/a.scala", "deadbeef"), ("r", "", "c"), ("", "", ""))
    val got = rows.toDF("repo", "path", "commit")
      .select(xxhash64(col("repo"), col("path"), col("commit"))).as[Long].collect()
    rows.zip(got).foreach { case ((re, pa, co), h) =>
      val expect = testutil.ReferenceOracle.docId(model.CorpusRow(re, pa, co, "scala", ""))
      assert(h === expect)
    }
  }

  test("oracle sha256 replicates sha2(content, 256)") {
    val rows = Seq("", "hello\nworld", "däta ünïcode", "x" * 10000)
    val got = rows.toDF("c").select(sha2(col("c"), 256)).as[String].collect()
    rows.zip(got).foreach { case (s, h) =>
      assert(h === testutil.ReferenceOracle.sha256Hex(s))
    }
  }
}
