package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.TrainedState
import graft.text.Dsir

/** The streaming DSIR score must be the batch `score` verbatim per
  * micro-batch under a model trained once — including through the
  * persisted-artifact round trip. */
class StreamingDsirSpec extends SparkTestBase {
  import spark.implicits._

  private def keyed(rows: Seq[Row]): Map[Long, (Long, Long, Long)] =
    rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("per-batch scores == batch score under the same trained model, " +
      "across micro-batches, through save/load") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val target = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("dsir_model").toString
    TrainedState.saveDsirModel(
      Dsir.model(corpus, target, "doc_id", "text"), dir)
    val model = TrainedState.loadDsirModel(spark, dir)

    val docs = corpus.filter(col("doc_id") < 24).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingDsir.serveScore(
      mem.toDF().toDF("doc_id", "text"), model) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      docs.grouped(10).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = Dsir.score(corpus.filter(col("doc_id") < 24),
      "doc_id", "text", model).collect()
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed scores diverged from the batch plan")
    assert(collected.size == 24)
  }

  test("serving docs with out-of-vocabulary tokens counts model tokens " +
      "only (the trained-corpus convention)") {
    val raw = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val model = Dsir.model(raw, raw, "doc_id", "text")
    val served = Dsir.score(
        Seq((9L, "apple zzznovel")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served === Seq((9L, 1L))) // zzznovel joined away
  }

  test("load rejects a wrong-schema artifact") {
    val dir = java.nio.file.Files
      .createTempDirectory("dsir_bad").toString
    Seq(("x", 1)).toDF("w", "dsir_e6").write.mode("overwrite").parquet(dir)
    intercept[IllegalArgumentException] {
      TrainedState.loadDsirModel(spark, dir)
    }
  }
}
