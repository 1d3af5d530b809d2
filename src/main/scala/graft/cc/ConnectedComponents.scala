package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative connected components over DataFrames — alternating
  * large-star/small-star (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014; SURVEY.md §2 rows 30–33). Converges in O(log n)
  * rounds; each round is two `groupBy(min)` + join-back shuffles.
  *
  * Plan hygiene: every round ends in `localCheckpoint(eager)` — without it
  * the logical plan doubles per iteration and Catalyst re-analysis dominates
  * (classic iterative-DataFrame failure). Convergence is detected by a cheap
  * (count, xor/sum-of-hash) checksum instead of a full `except`.
  */
object ConnectedComponents {

  /** @param edges DataFrame with long columns `a`, `b` (undirected).
    * @param maxLocalEdges size-aware hybrid cutoff: once the star-contracted
    *        edge set fits comfortably on the driver (it shrinks
    *        geometrically per round), finish with a local union-find
    *        instead of paying O(log n) more distributed rounds of pure
    *        scheduling latency. 5M edges ≈ 80 MB — trivial for any real
    *        driver; set 0 to force the fully-distributed path (tests do).
    * @return mapping `doc_id, cluster_id` for every vertex appearing in an
    *         edge; cluster_id = min doc_id of the component.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
      maxLocalEdges: Long = 5000000L): DataFrame = {
    // Orient big → small; drop self-loops. Persisted across the size probe:
    // without it the probe's count() recomputes the whole upstream plan once
    // more before the distinct (or the localFinish collect) reads it again.
    val oriented = edges
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .persist()

    // Fast path: an edge list already small enough for the driver skips the
    // distinct shuffle AND the star rounds entirely — union-find tolerates
    // duplicate edges. ONE incremental take replaces the old count+collect
    // job pair: if the list fits the cutoff, the taken rows ARE the
    // union-find input (take's limit+1 probe proves the bound; row order
    // is irrelevant to min-root union-find). CC sits on four driver
    // surfaces (batch clusters, incremental clusters, embedding clusters),
    // so the saved job is paid back per entry.
    if (maxLocalEdges > 0) {
      import spark.implicits._
      val cap = math.min(maxLocalEdges, Int.MaxValue - 2L).toInt
      val head = oriented.as[(Long, Long)].take(cap + 1)
      if (head.length <= cap) {
        oriented.unpersist(blocking = false)
        return localFinish(spark, head)
      }
    }

    var e = oriented.distinct().localCheckpoint(true)
    oriented.unpersist(blocking = false)

    var converged = false
    var iter = 0
    var prev = checksum(e)
    while (!converged && iter < maxIter && prev._1 > maxLocalEdges) {
      // Large-star: for each u over its full neighborhood Γ(u),
      // m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
      val bi = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = bi.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()

      // Small-star on (u > v) edges: m = min(N⁻(u) ∪ {u}) = min neighbor;
      // emit (v, m) for v ∈ N⁻(u) \ {m} plus (u, m).
      val mins2 = ls.groupBy("u").agg(min("v").as("mn"))
      val ss = ls.join(mins2, "u")
        .where(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v"))
        .union(mins2.select(col("u"), col("mn").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      val cur = checksum(ss)
      converged = cur == prev
      prev = cur
      e = ss
      iter += 1
    }

    if (!converged && prev._1 <= maxLocalEdges) {
      import spark.implicits._
      return localFinish(spark, e.as[(Long, Long)].collect())
    }

    // At the fixpoint edges form stars (child → component min).
    e.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(e.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .distinct()
  }

  /** Driver-side union-find over a star-contracted edge set (same
    * components as the input graph — star rounds only rewire within
    * components and every non-root node keeps an edge until convergence).
    */
  private def localFinish(spark: SparkSession, edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x
      while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    // normalize roots to component minima
    val nodes = edges.iterator.flatMap(t => Iterator(t._1, t._2)).toArray.distinct
    val minOf = new java.util.HashMap[Long, Long]()
    nodes.foreach { n =>
      val r = find(n)
      val cur = minOf.getOrDefault(r, Long.MaxValue)
      if (n < cur) minOf.put(r, n)
    }
    nodes.toSeq.map(n => (n, minOf.get(find(n)))).toDF("doc_id", "cluster_id")
  }

  /** Attach cluster ids to every doc; vertices not in any edge are singleton
    * clusters of themselves.
    */
  def assignAll(docs: DataFrame, mapping: DataFrame): DataFrame =
    docs.select("doc_id")
      .join(mapping, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))

  private def checksum(e: DataFrame): (Long, Long) = {
    // bit_xor is order-independent and cannot overflow (edges are distinct,
    // so xor-of-set + count identifies the set for convergence purposes).
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }
}
