package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PortableSimSpec extends SparkTestBase {

  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the " +
    "river bank while a cold wind blows through the tall green trees"

  private def docs = Seq(
    (0L, base),
    (1L, base.replace("cold", "warm")), // near-dup of 0
    (2L, base),                          // exact dup of 0
    (3L, "completely different text about spark catalyst optimizer rules " +
      "and physical plan selection for distributed joins over parquet"),
    (4L, "xy")                           // < 3 tokens: no gram universe
  ).toDF("doc_id", "text")

  test("minhashPairsMd5: exact dup at jaccard 1, near dup found, " +
      "unrelated not paired") {
    val pairs = PortableSim.minhashPairsMd5(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 2L)), s"exact dup missed: $pairs")
    assert(pairs.find(p => (p._1, p._2) == (0L, 2L)).get._3 == 1.0)
    assert(keys.contains((0L, 1L)) || keys.contains((1L, 2L)),
      s"near dup missed: $pairs")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"gram-less doc paired: $pairs")
  }

  test("simhashSigsMd5: identical text -> identical signature; every doc " +
      "(even token-less) gets a row; empty text -> 0") {
    val d = docs.unionByName(Seq((5L, "")).toDF("doc_id", "text"))
    val sigs = PortableSim.simhashSigsMd5(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 6)
    assert(sigs(0L) == sigs(2L))
    assert(sigs(5L) == 0L)
    assert(sigs.values.forall(s => s >= 0L && s <= 0xFFFFFFFFL),
      s"signature outside 32 bits: $sigs")
  }

  test("simhashPairsMd5: exact dup at hamming 0; near dup within budget; " +
      "unrelated not paired") {
    val pairs = PortableSim.simhashPairsMd5(docs, "doc_id", "text",
      maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 0L),
      s"exact dup not at hamming 0: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
  }

  test("lshTopKMd5: planted exact duplicate is every query's rank-1 " +
      "neighbor at cosine 1") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(j => (math.sin(i * 31 + j) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val corpus = emb.unionByName(
      emb.filter($"vec_id" < 10)
        .select(($"vec_id" + 100L).as("vec_id"), $"embedding"))
    val top = PortableSim.lshTopKMd5(emb.filter($"vec_id" < 10), corpus,
      dim = 64, numPlanes = 8, k = 1, numTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(top.length == 10, s"missing queries: ${top.toSeq}")
    top.foreach { case (q, n, cos) =>
      assert(n == q + 100L && math.abs(cos - 1.0) < 1e-9,
        s"query $q: expected planted dup ${q + 100L} at cos 1, got ($n, $cos)")
    }
  }

  test("portable pipelines schedule NO Spark job at DataFrame construction " +
      "(the eager-localCheckpoint failure mode)") {
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      PortableSim.minhashPairsMd5(docs, "doc_id", "text")
      PortableSim.simhashPairsMd5(docs, "doc_id", "text", maxHamming = 10)
      // listener delivery is async; a construction-scheduled job would
      // enqueue its start event synchronously with submission, so a short
      // settle window is enough to catch it
      Thread.sleep(300)
      assert(jobs == 0, s"construction scheduled $jobs Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
