package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DedupClustersSpec extends SparkTestBase {

  import spark.implicits._

  test("connected components resolve transitive chains to min id") {
    val ids = (0L to 9L).toDF("id")
    // chain 0-1-2-3 (diameter 3), pair 5-6, singletons 4,7,8,9
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L && got(3L) == 0L)
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got(4L) == 4L && got(9L) == 9L)
  }

  test("distributed loop (forced) resolves the same chains") {
    val ids = (0L to 9L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = DedupClusters
      .connectedComponents(ids, pairs, localEdgeThreshold = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L && got(3L) == 0L)
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got(4L) == 4L && got(9L) == 9L)
  }

  test("edges through out-of-universe nodes are dropped identically on both paths") {
    // (3,5),(3,6) with 3 outside the universe: neither path may union 5,6
    // through the phantom node, and no emitted label may be a non-id
    val ids = Seq(5L, 6L).toDF("id")
    val pairs = Seq((3L, 5L), (3L, 6L)).toDF("id_a", "id_b")
    val local = DedupClusters.connectedComponents(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = DedupClusters
      .connectedComponents(ids, pairs, localEdgeThreshold = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == Map(5L -> 5L, 6L -> 6L))
    assert(dist == local)
  }

  test("fractional ids converge on the distributed path (no decimal-collapsed invariant)") {
    // regression: double ids all truncating to the same decimal(38,0)
    // blinded the label-sum check and the loop exited before the fixpoint
    val ids = (0 until 8).map(i => 0.01 * (i + 1)).toDF("id")
    val pairs = (0 until 7)
      .map(i => (0.01 * (i + 1), 0.01 * (i + 2))).toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(ids, pairs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // one chain: every node's cluster is the min id
    got.foreach { case (_, c) => assert(math.abs(c - 0.01) < 1e-9) }
  }

  test("local union-find and distributed loop agree on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60L
    val ids = (0L until n).toDF("id")
    val pairs = Seq.fill(50)((rnd.nextLong().abs % n, rnd.nextLong().abs % n))
      .toDF("id_a", "id_b")
    val local = DedupClusters.connectedComponents(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = DedupClusters
      .connectedComponents(ids, pairs, localEdgeThreshold = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("cluster summary counts sizes and representatives") {
    val ids = (0L to 4L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val labels = DedupClusters.connectedComponents(ids, pairs)
    val summary = DedupClusters.clusterSummary(labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary(0L) == (3L, 0L))
    assert(summary(3L) == (1L, 3L))
  }

  test("clusterDensity separates cliques from stars, drops singletons") {
    // clique {0,1,2}: 3 edges over 3 nodes -> 2e6*3/(3*2) = 1e6 ppm;
    // star {10..13} (hub 10): 3 edges over 4 nodes -> 2e6*3/12 = 500000;
    // singleton {20}: excluded (no pair evidence to audit)
    val ids = (Seq(0L, 1L, 2L) ++ (10L to 13L) :+ 20L).toDF("id")
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("id_a", "id_b")
    val labels = DedupClusters.connectedComponents(ids, pairs)
    val got = DedupClusters.clusterDensity(labels, pairs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(0L -> (3L, 3L, 1000000L), 10L -> (4L, 3L, 500000L)))
  }

  test("end-to-end: minhash pairs -> clusters keep one per dup group") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (10L, base), (11L, base), (12L, base.replace("kappa", "koppa")),
      (20L, "unrelated words entirely different content about query engines " +
        "and distributed physical plans with partitioned columnar storage")
    ).toDF("doc_id", "text")
    val pairs = Similarity.minhashPairs(docs, "doc_id", "text", minJaccard = 0.6)
      .select(col("id_a"), col("id_b"))
    val labels = DedupClusters.connectedComponents(
      docs.select(col("doc_id").as("id")), pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(20L) == 20L)
  }
}
