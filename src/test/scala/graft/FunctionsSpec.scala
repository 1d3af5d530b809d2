package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, LongArrayEqualCount}

class FunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("equal_lane_count: Column API, codegen and interpreted agree") {
    val rnd = new java.util.SplittableRandom(31)
    val rows = (1 to 200).map { _ =>
      val a = Array.fill(128)(rnd.nextLong(4)) // small alphabet → real collisions
      val b = Array.fill(128)(rnd.nextLong(4))
      (a, b, a.zip(b).count { case (x, y) => x == y })
    }
    val got = rows.toDF("a", "b", "expect")
      .withColumn("got", LongArrayEqualCount.equalLaneCount(
        org.apache.spark.sql.functions.col("a"), org.apache.spark.sql.functions.col("b")))
      .select("expect", "got").as[(Int, Int)].collect()
    got.foreach { case (e, g) => assert(g === e) }
  }

  test("equal_lane_count: SQL registration works") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT equal_lane_count(array(1L,2L,3L), array(1L,9L,3L)) AS c").as[Int].head()
    assert(out === 2)
  }

  test("null and length-mismatch behavior") {
    val df = Seq(
      (Some(Array(1L, 2L)), Some(Array(1L, 2L, 3L))),
      (None: Option[Array[Long]], Some(Array(1L)))
    ).toDF("a", "b")
      .withColumn("c", LongArrayEqualCount.equalLaneCount(
        org.apache.spark.sql.functions.col("a"), org.apache.spark.sql.functions.col("b")))
    val got = df.select("c").collect()
    assert(got(0).getInt(0) === 2) // prefix compare on mismatched lengths
    assert(got(1).isNullAt(0)) // null in → null out
  }
}
