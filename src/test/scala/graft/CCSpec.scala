package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

import graft.cc.ConnectedComponents

class CCSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize to min member per component
    val comp = nodes.groupBy(find)
    comp.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }.toMap
  }

  test("matches union-find on random graphs (chains, stars, cliques)") {
    val rnd = new java.util.SplittableRandom(29)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(300)
      val edges = mutable.ArrayBuffer.empty[(Long, Long)]
      // random edges
      for (_ <- 1 to n) edges += ((rnd.nextLong(1L << 40), rnd.nextLong(1L << 40)))
      // a long chain (worst case for naive propagation)
      val chain = Array.fill(120)(rnd.nextLong(1L << 40))
      for (i <- 0 until chain.length - 1) edges += ((chain(i), chain(i + 1)))
      // a star and a clique
      val hub = rnd.nextLong(1L << 40)
      for (_ <- 1 to 50) edges += ((hub, rnd.nextLong(1L << 40)))

      val expect = unionFind(n, edges.toSeq)
      // fully-distributed path (maxLocalEdges = 0)
      val dist = ConnectedComponents.run(spark, edges.toSeq.toDF("a", "b"), maxLocalEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(dist === expect, s"trial $trial (distributed)")
      // hybrid path (driver union-find finish)
      val hybrid = ConnectedComponents.run(spark, edges.toSeq.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(hybrid === expect, s"trial $trial (hybrid)")
    }
  }

  test("fast local path tolerates duplicate edges and self-loops") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (9L, 9L))
    val got = ConnectedComponents.run(spark, edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    // 9 only appears as a self-loop → not a vertex of any real edge
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty and single-edge inputs") {
    val empty = ConnectedComponents.run(spark, Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(empty.count() === 0)
    val one = ConnectedComponents.run(spark, Seq((5L, 2L)).toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(one === Map(5L -> 2L, 2L -> 2L))
  }

  test("assignAll gives singletons their own id") {
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val mapping = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val got = ConnectedComponents.assignAll(docs, mapping).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }
}
