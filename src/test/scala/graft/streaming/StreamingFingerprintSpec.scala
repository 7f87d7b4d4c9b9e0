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

  test("admit: streaming probe→reject→fold-in loop == the batch-" +
      "sequential reference; dup of an EARLIER batch's admit rejects") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(20)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs.take(10).toSeq.toDF("doc_id", "text")
    val idx0 = Fingerprint.winnow(corpus, "doc_id", "text", 12, 5)
      .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
    // batch 1 admits docs 10-14 plus a copy of indexed doc 0 (reject);
    // batch 2 carries a copy of BATCH-1-admitted doc 10 (reject — only
    // catchable because batch 1 folded in) and fresh docs 15-19
    val batches = Seq(
      docs.slice(10, 15).toSeq :+ ((900L, docs.head._2)),
      docs.slice(15, 20).toSeq :+ ((901L, docs(10)._2)))
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, (Boolean, Long)]
    val q = StreamingFingerprint.admit(
      mem.toDF().toDF("doc_id", "text"), idx0,
      "doc_id", "text", k = 12, w = 5, minShared = 3) { (df, _) =>
      df.collect().foreach(r =>
        got(r.getLong(0)) = (r.getBoolean(1), r.getLong(2)))
    }
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // batch-sequential reference: same loop, no streaming machinery
    var refIdx = idx0
    val want = scala.collection.mutable.Map.empty[Long, Boolean]
    batches.foreach { b =>
      val bdf = b.toDF("doc_id", "text")
      val rej = Fingerprint.pairsAgainstIndex(bdf, refIdx, "doc_id",
          "text", 12, 5, minShared = 3)
        .select(col("id_b").as("id")).distinct()
        .collect().map(_.getLong(0)).toSet
      b.foreach { case (id, _) => want(id) = !rej.contains(id) }
      refIdx = Fingerprint.foldIntoIndex(refIdx, bdf, "doc_id", "text",
        12, 5, rejectIds = rej.toSeq.toDF("doc_id"))
        .localCheckpoint(true)
    }
    assert(got.view.mapValues(_._1).toMap === want.toMap)
    assert(got(900L)._1 === false, "copy of an indexed doc admitted")
    assert(got(901L)._1 === false,
      "copy of an earlier batch's admit slipped through — fold-in dead")
    assert(got.values.count(_._1) > 0, "nothing admitted at all")
    assert(got(901L)._2 >= 1L)
  }
}
