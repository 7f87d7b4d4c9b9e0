package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming BM25 serve must be the batch [[graft.text.Retrieval
  * .topK]] verbatim per micro-batch against the persisted index. */
class StreamingRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch top-k == batch topK through the persisted index, " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val (p0, t0, d0, s0) = graft.text.Retrieval.buildIndex(
      docs, "doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("retr_serve").toString
    graft.similarity.TrainedState.saveRetrievalIndex(p0, t0, d0, s0, root)
    val (p, t, d, s) = graft.similarity.TrainedState
      .loadRetrievalIndex(spark, root)

    val batches = Seq(
      Seq((1L, Seq("stream", "merge"))),
      Seq((2L, Seq("table", "scan")), (3L, Seq("vector"))))
    val mem = MemoryStream[(Long, Seq[String])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingRetrieval.serveTopK(
      mem.toDF().toDF("query_id", "terms"), p, t, d, s, k = 5) {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = graft.text.Retrieval.topK(
      batches.flatten.toDF("query_id", "terms"), p, t, d, s, 5).collect()
    def keyed(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq))
    assert(collected.nonEmpty)
  }

  test("buildRetrievalPersisted + forgetRetrievalPersisted: streamed " +
      "fold-in == rebuild, redelivery rejects loudly, streamed " +
      "deletion drops membership at the NEXT FromArtifacts trigger, " +
      "receipts carry the pre-delete dl, a forgotten doc re-ingests, " +
      "and the policy compaction folds the sub-artifacts") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("retr_loop").toString + "/idx"
    val (p0, t0, d0, s0) = graft.text.Retrieval.buildIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    TS.saveRetrievalIndex(p0, t0, d0, s0, root)

    // fold the odd docs in two streamed batches; maxGenerations = 2 so
    // the second trigger compacts each sub-artifact
    def docRows(m: Long) = docs.filter(pmod(col("doc_id"), lit(4)) === m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRetrieval.buildRetrievalPersisted(
      mem.toDF().toDF("doc_id", "text"), root, maxGenerations = 2L)()
    try {
      mem.addData(docRows(1L): _*); q.processAllAvailable()
      mem.addData(docRows(3L): _*); q.processAllAvailable()
    } finally q.stop()
    val qs = Seq((1L, Seq("stream", "filter", "merge")),
      (2L, Seq("table", "scan"))).toDF("query_id", "terms")
    def served() = {
      val (p, t, d, s) = TS.loadRetrievalIndexCached(spark, root)
      graft.text.Retrieval.topK(qs, p, t, d, s, 10).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    val full = graft.text.Retrieval.buildIndex(docs, "doc_id", "text")
    val want = graft.text.Retrieval.topK(qs, full._1, full._2, full._3,
        full._4, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(served() == want, "streamed fold-in diverged from rebuild")
    Seq("postings", "terms", "doclens").foreach { sub =>
      assert(TS.deltaGenerations(spark, s"$root/$sub") == 0L,
        s"$sub did not compact at the policy threshold")
    }

    // redelivery of a live doc rejects loudly
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingRetrieval.buildRetrievalPersisted(
      mem2.toDF().toDF("doc_id", "text"), root)()
    try {
      mem2.addData(docRows(1L).head)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("redelivered")), s"wrong: $ex")
    } finally q2.stop()

    // stream-delete one doc that currently serves for query 1; a
    // serve-from-artifacts loop picks the tombstone up NEXT trigger
    val victim = served().filter(_._1 == 1L).minBy(_._2)._3
    val victimDl = TS.loadRetrievalIndex(spark, root)._3
      .filter(col("doc_id") === victim).head().getLong(1)
    val receipts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val memDel = MemoryStream[Long]
    val qDel = StreamingRetrieval.forgetRetrievalPersisted(
      memDel.toDF().toDF("doc_id"), root) { (df, _) =>
      receipts ++= df.collect()
    }
    try {
      memDel.addData(victim, 999999999L); qDel.processAllAvailable()
    } finally qDel.stop()
    val byId = receipts.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2))).toMap
    assert(byId == Map(victim -> (victimDl, true),
      999999999L -> (-1L, false)), s"receipts: $byId")
    val post = served()
    assert(post.forall(_._3 != victim),
      "the tombstoned doc still serves")
    assert(post.nonEmpty)

    // the forgotten doc re-ingests through the guard and serves again
    val victimText = docs.filter(col("doc_id") === victim)
      .head().getString(1)
    val mem3 = MemoryStream[(Long, String)]
    val q3 = StreamingRetrieval.buildRetrievalPersisted(
      mem3.toDF().toDF("doc_id", "text"), root)()
    try {
      mem3.addData((victim, victimText)); q3.processAllAvailable()
    } finally q3.stop()
    assert(served().exists(_._3 == victim),
      "re-ingested doc must serve again")
  }
}
