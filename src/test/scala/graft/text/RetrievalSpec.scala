package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Retrieval]] — hand-computed BM25 on a tiny corpus, the
  * distinct-query-term and recall-zero conventions, and the persisted
  * round-trip. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date"),
    (4L, "")).toDF("doc_id", "text")

  /** Plain-JVM replay of the scoring contract. */
  private def refBm25(tf: Long, df: Long, dl: Long, n: Long,
                      avgdl: Double): Long =
    math.round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      tf * 2.2 / (tf + 1.2 * (0.25 + dl * 0.75 / avgdl)) * 1e9)

  test("topK == JVM reference on the hand corpus; empty docs excluded " +
      "from stats") {
    val (p, t, d, s) = Retrieval.buildIndex(corpus, "doc_id", "text")
    val qs = Seq((1L, Seq("apple", "cherry"))).toDF("query_id", "terms")
    val got = Retrieval.topK(qs, p, t, d, s, k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    // n=3 (doc 4 empty, excluded), avgdl = (3+2+4)/3
    // doc 1: apple tf2 df1; doc 2: cherry tf1 df2; doc 3: cherry tf3 df2
    val avgdl = 3.0
    assert(got(1L) === refBm25(tf = 2, df = 1, dl = 3, n = 3, avgdl))
    assert(got(2L) === refBm25(tf = 1, df = 2, dl = 2, n = 3, avgdl))
    assert(got(3L) === refBm25(tf = 3, df = 2, dl = 4, n = 3, avgdl))
    assert(!got.contains(4L))
  }

  test("repeated query terms count once; no-match queries emit no rows") {
    val (p, t, d, s) = Retrieval.buildIndex(corpus, "doc_id", "text")
    val qs = Seq(
      (1L, Seq("apple")),
      (2L, Seq("apple", "apple", "apple")),
      (3L, Seq("zzz", "not_here"))).toDF("query_id", "terms")
    val rows = Retrieval.topK(qs, p, t, d, s, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val q1 = rows.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet
    val q2 = rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet
    assert(q1 === q2, "duplicate query terms changed the score")
    assert(!rows.exists(_._1 == 3L), "no-match query emitted rows")
  }

  test("persisted round-trip serves identically (schema fail-fast)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val (p0, t0, d0, s0) = Retrieval.buildIndex(docs, "doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("retrieval_index").toString
    graft.similarity.TrainedState.saveRetrievalIndex(p0, t0, d0, s0, root)
    val (p, t, d, s) = graft.similarity.TrainedState
      .loadRetrievalIndex(spark, root)
    val qs = Seq((7L, Seq("stream", "merge"))).toDF("query_id", "terms")
    val a = Retrieval.topK(qs, p0, t0, d0, s0, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val b = Retrieval.topK(qs, p, t, d, s, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
