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

  private def topkRows(idx: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame), qs: org.apache.spark.sql.DataFrame,
      k: Int = 10) =
    Retrieval.topK(qs, idx._1, idx._2, idx._3, idx._4, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("foldInRetrieval: the delta-folded index serves BIT-IDENTICALLY " +
      "to a full rebuild — accumulated dfs across two generations " +
      "touching the same terms, exact stats merge") {
    val TS = graft.similarity.TrainedState
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val root = java.nio.file.Files
      .createTempDirectory("retr_fold").toString + "/idx"
    val (p0, t0, d0, s0) = Retrieval.buildIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    TS.saveRetrievalIndex(p0, t0, d0, s0, root)
    // two fold batches with heavily OVERLAPPING vocabularies — batch 2's
    // accumulated df must read batch 1's generation, not the base alone
    Seq(1L, 3L).foreach { m =>
      val (bp, _, bl, _) = Retrieval.buildIndex(
        docs.filter(pmod(col("doc_id"), lit(4)) === m), "doc_id", "text")
      TS.foldInRetrieval(spark, bp, bl, root)
    }
    val qs = Seq((1L, Seq("stream", "filter", "merge")),
      (2L, Seq("table", "scan"))).toDF("query_id", "terms")
    val want = topkRows(Retrieval.buildIndex(docs, "doc_id", "text"), qs)
    assert(topkRows(TS.loadRetrievalIndex(spark, root), qs) == want,
      "folded index diverged from the full rebuild")
    assert(want.nonEmpty)
    // the terms artifact reconciles to the exact full-corpus dfs
    val fullDf = Retrieval.buildIndex(docs, "doc_id", "text")._2
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val foldedDf = TS.loadRetrievalIndex(spark, root)._2
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(foldedDf == fullDf, "accumulated dfs diverged from a recount")
  }

  test("forgetRetrievalDocs is LAZY-correct: membership drops " +
      "immediately, surviving scores keep the pre-delete magnitudes; " +
      "consolidateRetrievalIndex then equals a rebuild over the " +
      "survivors with every sub-artifact folded physically") {
    val TS = graft.similarity.TrainedState
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val root = java.nio.file.Files
      .createTempDirectory("retr_forget").toString + "/idx"
    val full = Retrieval.buildIndex(docs, "doc_id", "text")
    TS.saveRetrievalIndex(full._1, full._2, full._3, full._4, root)
    val doomed = docs.filter(col("doc_id") % 3 === 1).select(col("doc_id"))
    TS.forgetRetrievalDocs(doomed, root)
    val qs = Seq((1L, Seq("stream", "filter", "merge")),
      (2L, Seq("table", "scan"))).toDF("query_id", "terms")
    // lazy serve: the full-index rows minus the deleted docs, ranks
    // re-dense — membership from the tombstones, magnitudes stale
    val lazyGot = topkRows(TS.loadRetrievalIndex(spark, root), qs, k = 30)
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    assert(lazyGot.nonEmpty &&
      lazyGot.forall(r => !doomedIds.contains(r._3)),
      "a tombstoned doc served from the lazy index")
    val fullScores = topkRows(full, qs, k = 1000)
      .map(r => (r._1, r._3) -> r._4).toMap
    assert(lazyGot.forall(r => fullScores((r._1, r._3)) == r._4),
      "lazy deletion changed a surviving doc's score magnitude")
    // consolidation: exact rebuild over survivors
    TS.consolidateRetrievalIndex(spark, root)
    val want = topkRows(Retrieval.buildIndex(
      docs.filter(col("doc_id") % 3 =!= 1), "doc_id", "text"), qs)
    assert(topkRows(TS.loadRetrievalIndex(spark, root), qs) == want,
      "consolidated index diverged from a rebuild over the survivors")
    // physical state: generations folded, no tombstones, no dead
    // postings rows, stats recomputed
    Seq("postings", "terms", "doclens").foreach { sub =>
      assert(TS.deltaGenerations(spark, s"$root/$sub") == 0L,
        s"$sub still carries generations")
    }
    assert(spark.read.parquet(s"$root/doclens")
      .filter(col("dl").isNull).count() == 0)
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("doc_id") % 3 === 1).count() == 0,
      "consolidation left dead postings rows")
    assert(TS.detectArtifactKind(spark, root) == Some("retrieval"))
  }

  test("topK pushes the localized query-term set into the postings " +
      "scan as a literal isin — row-group pruning against the " +
      "term-sorted layout, not a full postings read per probe batch") {
    val TS = graft.similarity.TrainedState
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val (p0, t0, d0, s0) = Retrieval.buildIndex(docs, "doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("retr_prune").toString + "/idx"
    TS.saveRetrievalIndex(p0, t0, d0, s0, root)
    val (p, t, d, s) = TS.loadRetrievalIndex(spark, root)
    val qs = Seq((1L, Seq("stream", "merge"))).toDF("query_id", "terms")
    val plan = Retrieval.topK(qs, p, t, d, s, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("In(term") || plan.contains("EqualTo(term")),
      s"query-term pruning did not reach the postings scan:\n$plan")
  }
}
