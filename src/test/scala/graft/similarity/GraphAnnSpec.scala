package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[GraphAnn.searchGraph]] — exact degeneration on a complete graph,
  * hop-0 semantics, planted-geometry greedy routing, determinism, and
  * the argument guards. */
class GraphAnnSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  private def collectTopK(df: DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("complete graph, one hop, full beam == brute force") {
    val e = emb.filter(col("vec_id") < 40)
    val n = e.count().toInt
    // degree n-1 graph = every node's out-edges reach everyone else, so
    // ONE hop from any entry visits the whole corpus and the search must
    // equal exact brute force for every query
    val edges = Similarity.bruteTopK(e, e, n - 1)
    val probes = e.filter(col("vec_id") % 10 === 0)
    val got = GraphAnn.searchGraph(probes, edges, e,
      entryId = 0L, beam = n, hops = 1, k = 3)
    val want = Similarity.bruteTopK(probes, e, 3)
    assert(collectTopK(got) === collectTopK(want))
  }

  test("hops = 0 scores only the entry node; self-entry emits no rows") {
    val e = emb.filter(col("vec_id") < 30)
    val edges = Similarity.bruteTopK(e, e, 3)
    val probes = e.filter(col("vec_id") < 2) // query 0 IS the entry
    val got = GraphAnn.searchGraph(probes, edges, e,
        entryId = 0L, beam = 4, hops = 0, k = 3)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toSet
    assert(got === Set((1L, 0L))) // query 1 sees the entry; query 0 drops its self-row
  }

  test("planted geometry: greedy walk routes across the graph to the planted near-dup") {
    // two tight clusters on orthogonal axes plus a bridge; entry sits in
    // cluster A, the query targets cluster B — the degree-3 graph links
    // A's edge node to the bridge, so the greedy walk must route
    // 0 → 2 → 3 → 4 → 6 within 4 hops at beam 2 (degree 2 would make
    // cluster A a sink — the out-degree/connectivity trade every
    // navigable-graph index tunes)
    val corpus = Seq(
      (0L, Array(1.00f, 0.00f)),  // entry, cluster A
      (1L, Array(0.99f, 0.14f)),
      (2L, Array(0.97f, 0.24f)),
      (3L, Array(0.71f, 0.71f)),  // bridge
      (4L, Array(0.24f, 0.97f)),
      (5L, Array(0.14f, 0.99f)),
      (6L, Array(0.00f, 1.00f))   // planted target, cluster B
    ).toDF("vec_id", "embedding")
    val query = Seq((100L, Array(0.01f, 1.00f))).toDF("vec_id", "embedding")
    val edges = Similarity.bruteTopK(corpus, corpus, 3)
    val got = GraphAnn.searchGraph(query, edges, corpus,
        entryId = 0L, beam = 2, hops = 4, k = 1)
      .select(col("neighbor_id")).as[Long].collect()
    assert(got.toSeq === Seq(6L))
  }

  test("deterministic: two runs produce identical output") {
    val e = emb.filter(col("vec_id") < 60)
    val edges = Similarity.bruteTopK(e, e, 4)
    val probes = e.filter(col("vec_id") % 15 === 0)
    def run() = collectTopK(GraphAnn.searchGraph(probes, edges, e,
      entryId = 0L, beam = 3, hops = 2, k = 3))
    assert(run() === run())
  }

  test("wider beam at saturating hops converges to brute on a connected graph") {
    val e = emb.filter(col("vec_id") < 40)
    val n = e.count().toInt
    val edges = Similarity.bruteTopK(e, e, 4)
    val probes = e.filter(col("vec_id") % 10 === 0)
    // beam = n visits every node REACHABLE from the entry; on this
    // corpus the degree-4 graph is entry-connected (verified by the
    // assertion itself matching brute exactly)
    val got = GraphAnn.searchGraph(probes, edges, e,
      entryId = 0L, beam = n, hops = n, k = 3)
    assert(collectTopK(got) === collectTopK(Similarity.bruteTopK(probes, e, 3)))
  }

  test("argument guards") {
    val e = emb.limit(5)
    val edges = Similarity.bruteTopK(e, e, 2)
    intercept[IllegalArgumentException] {
      GraphAnn.searchGraph(e, edges, e, 0L, beam = 0, hops = 1, k = 1)
    }
    intercept[IllegalArgumentException] {
      GraphAnn.searchGraph(e, edges, e, 0L, beam = 1, hops = -1, k = 1)
    }
    intercept[IllegalArgumentException] {
      GraphAnn.searchGraph(e, edges, e, 0L, beam = 1, hops = 1, k = 0)
    }
  }
}
