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
}
