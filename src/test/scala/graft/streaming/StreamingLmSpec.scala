package graft.streaming

import graft.SparkTestBase
import graft.text.NgramLm
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming LM score must be the batch `scoreWith` verbatim per
  * micro-batch under a model trained once. */
class StreamingLmSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch scores == batch scoreWith under the same trained " +
      "model, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (bigrams, ctx, vocab) = NgramLm.fit(corpus, "doc_id", "text")

    val docs = corpus.filter(col("doc_id") < 24).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingLm.serveScore(
      mem.toDF().toDF("doc_id", "text"), bigrams, ctx, vocab) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      docs.grouped(10).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = NgramLm.scoreWith(corpus.filter(col("doc_id") < 24),
      "doc_id", "text", bigrams, ctx, vocab).collect()
    def keyed(rows: Seq[Row]): Map[Long, (Long, Long, Long)] =
      rows.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed scores diverged from the batch plan")
    assert(collected.size == 24)
  }

  test("serveBackoffScore: streamed scores through the PERSISTED model " +
      "== batch scoreBackoffWith (round-trip incl. schema fail-fast)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (tri0, bi0, uni0, total0) = NgramLm.fitBackoff(
      corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("backoff_model").toString
    graft.similarity.TrainedState.saveBackoffModel(
      tri0, bi0, uni0, total0, root)
    val (tri, bi, uni, total) = graft.similarity.TrainedState
      .loadBackoffModel(spark, root)

    val docs = corpus.filter(col("doc_id") < 20).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingLm.serveBackoffScore(
      mem.toDF().toDF("doc_id", "text"), tri, bi, uni, total) {
      (df, _) => collected ++= df.collect()
    }
    try {
      docs.grouped(8).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = NgramLm.scoreBackoffWith(
      corpus.filter(col("doc_id") < 20), "doc_id", "text",
      tri, bi, uni, total).collect()
    def keyed(rows: Seq[Row]) =
      rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed backoff scores diverged from the batch plan")
    assert(collected.size == 20)
    // held-out serving keeps backoff arms live on the odd docs
    assert(collected.exists(r => r.getLong(3) > 0 || r.getLong(4) > 0),
      "no backoff arm exercised — stream parity is vacuous")
  }

  test("self-trained score() == fit() + scoreWith() on the same corpus") {
    val corpus = graft.Tables.load(spark, sfDir, "documents")
      .limit(100).localCheckpoint(true)
    val (bigrams, ctx, vocab) = NgramLm.fit(corpus, "doc_id", "text")
    val a = NgramLm.score(corpus, "doc_id", "text")
    val b = NgramLm.scoreWith(corpus, "doc_id", "text", bigrams, ctx,
      vocab)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "score and fit+scoreWith disagree")
  }
}
