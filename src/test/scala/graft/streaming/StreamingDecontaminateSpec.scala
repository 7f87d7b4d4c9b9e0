package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingDecontaminate.admit]] — streamed decisions must equal the
  * batch [[graft.text.Decontaminate.flag]] on the same docs, across
  * micro-batch boundaries, with planted leaks flagged and clean docs
  * admitted; redelivery is idempotent (stateless admission). */
class StreamingDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  test("streamed admission == batch flag across micro-batches; planted " +
      "leak rejected, clean docs admitted; redelivery idempotent") {
    implicit val sqlCtx = spark.sqlContext
    // eval set: two real docs (their texts ARE the leak) — any corpus
    // doc sharing an 8-gram with them must flag
    val eval = docs.filter(col("doc_id").isin(3L, 7L))
      .select(col("doc_id").as("eval_id"), col("text"))
      .localCheckpoint(true)
    val batchDocs = docs.filter(col("doc_id") < 30)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batches = Seq(Seq(1L, 3L, 5L), Seq(7L, 9L, 11L), Seq(13L, 20L))

    val mem = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingDecontaminate.admit(
      mem.toDF().toDF("doc_id", "text"), eval,
      textCol = "text", n = 8) { (df, _) =>
      collected ++= df.select(col("doc_id"), col("n_hits"),
        col("contaminated")).collect()
    }
    try {
      batches.foreach { b =>
        mem.addData(b.map(id => id -> batchDocs(id)): _*)
        q.processAllAvailable()
      }
      val firstPass = collected.toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      // batch reference over the SAME doc set
      val ids = batches.flatten
      val ref = graft.text.Decontaminate.flag(
          docs.filter(col("doc_id").isin(ids: _*)), eval,
          idCol = "doc_id", textCol = "text", n = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(firstPass === ref,
        "streamed decisions diverged from the batch flag")
      // the planted leaks (the eval docs themselves) are rejected, and
      // at least one clean doc is admitted
      assert(firstPass.exists { case (id, _, c) => id == 3L && c })
      assert(firstPass.exists { case (id, _, c) => id == 7L && c })
      assert(firstPass.exists { case (_, _, c) => !c })
      // stateless admission: redelivering batch 1 reproduces its
      // decisions exactly
      collected.clear()
      mem.addData(batches.head.map(id => id -> batchDocs(id)): _*)
      q.processAllAvailable()
      val redelivered = collected.toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(redelivered ===
        firstPass.filter(t => batches.head.contains(t._1)))
    } finally q.stop()
  }

  test("an id that does not cast to BIGINT fails the trigger loudly — " +
      "it must not silently vanish from the decision stream") {
    implicit val sqlCtx = spark.sqlContext
    val eval = docs.filter(col("doc_id") === 3L)
      .select(col("doc_id").as("eval_id"), col("text"))
      .localCheckpoint(true)
    // a NULL id is the silent-vanish case: even under ANSI it casts to
    // null without error, and the old inner join then dropped the row
    // from the decision stream — neither admitted nor quarantined
    val mem = MemoryStream[(Option[Long], String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingDecontaminate.admit(
      mem.toDF().toDF("doc_id", "text"), eval,
      textCol = "text", n = 8) { (df, _) =>
      collected ++= df.select(col("doc_id")).collect()
    }
    try {
      mem.addData((Some(17L), "perfectly clean text with nothing shared"))
      q.processAllAvailable()
      assert(collected.map(_.getLong(0)).toSet == Set(17L))
      mem.addData((None, "some other clean text entirely"))
      val e = intercept[Exception] {
        q.processAllAvailable()
        q.awaitTermination()
      }
      val msg = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(_.toString).mkString("\n")
      assert(msg.contains("does not cast to BIGINT") ||
        msg.contains("USER_RAISED_EXCEPTION"),
        s"expected the loud cast failure, got: $msg")
    } finally q.stop()
  }
}
