package graft.streaming

import graft.SparkTestBase
import graft.text.BpeTrain
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming tokenizer must be the batch `applyMerges` verbatim per
  * micro-batch — trained merges applied identically to every batch. */
class StreamingTokenizeSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch token sequences == batch applyMerges, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val merges = BpeTrain.merges(corpus, "text", 5).localCheckpoint(true)

    val docs = corpus.filter(col("doc_id") < 30).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batches = docs.grouped(12).toSeq

    val mem = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingTokenize.serveBpe(
      mem.toDF().toDF("doc_id", "text"), merges) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = BpeTrain.applyMerges(
      corpus.filter(col("doc_id") < 30), "doc_id", "text", merges)
      .collect()
    def keyed(rows: Seq[Row]): Map[Long, Seq[String]] =
      rows.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed tokens diverged from the batch plan")
    assert(collected.size == 30)
  }

  test("applyMerges sequences are consistent with the tokenize histogram") {
    val corpus = graft.Tables.load(spark, sfDir, "documents")
    val merges = BpeTrain.merges(corpus, "text", 4).localCheckpoint(true)
    val fromSeqs = BpeTrain.applyMerges(corpus, "doc_id", "text", merges)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val hist = BpeTrain.tokenize(corpus, "text", merges)
    assert(fromSeqs.except(hist).isEmpty && hist.except(fromSeqs).isEmpty,
      "per-doc sequences disagree with the corpus histogram")
  }
}
