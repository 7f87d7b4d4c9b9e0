package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.text.Fingerprint

/** The streaming winnow-overlap serve must be the batch
  * [[Fingerprint.pairsAgainstIndex]] verbatim per micro-batch through
  * the persisted fingerprint index. */
class StreamingFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch pairs == batch pairsAgainstIndex through the " +
      "persisted index, across micro-batches incl. a planted copy") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(20)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs.take(14).toSeq.toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("fp_serve").toString + "/idx"
    Fingerprint.saveIndex(
      Fingerprint.winnow(corpus, "doc_id", "text", 12, 5)
        .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash")),
      root, 12, 5)
    val index = Fingerprint.loadIndex(spark, root)

    // batch 2 plants a copy of corpus doc 0 under id 900
    val batches = Seq(
      docs.slice(14, 17).toSeq,
      docs.slice(17, 20).toSeq :+ ((900L, docs.head._2)))
    val mem = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingFingerprint.servePairs(
      mem.toDF().toDF("doc_id", "text"), index,
      "doc_id", "text", k = 12, w = 5, minShared = 3) {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def keyed(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference: each batch independently against the SAME static index
    // (the serve never folds in mid-stream; cross-batch pairs are the
    // fold-in step's job between triggers)
    val ref = batches.flatMap { b =>
      Fingerprint.pairsAgainstIndex(b.toDF("doc_id", "text"), index,
        "doc_id", "text", 12, 5, minShared = 3).collect()
    }
    assert(keyed(collected.toSeq) === keyed(ref))
    assert(keyed(collected.toSeq).contains((0L, 900L)),
      "planted copy of an indexed doc not surfaced")
  }
}
