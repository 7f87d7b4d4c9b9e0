package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[QualityClassifier]] — hand-computed perceptron math on a 2-doc
  * corpus where every feature is knowable:
  *
  *   doc 0 (en): "the cat"    → len 7, alpha 6, punct 0, stop {the},
  *     2 tokens ⇒ c = [1000000, 857143, 0, 100000, 31250], y = +1
  *   doc 1 (de): "der hund!!" → len 10, alpha 7, punct 2, stop ∅,
  *     2 tokens ⇒ c = [1000000, 700000, 200000, 0, 31250], y = −1
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "en", "the cat"),
    (1L, "de", "der hund!!"))
    .toDF("doc_id", "lang", "text").repartition(2)

  test("iteration 1 sums every row (w=0 misclassifies all)") {
    // Δw = y0·c0 + y1·c1 slot-wise
    assert(QualityClassifier.fit(docs, QualityClassifier.enLabel, 1).toSeq ===
      Seq(0L, 157143L, -200000L, 100000L, 0L))
  }

  test("iteration 2 updates only the rows the new weights misclassify") {
    // under w1, doc 0's margin is positive (correct: y=+1, no update);
    // doc 1's margin 157143·0.7 − 200000·0.2 > 0 but y=−1 → misclassified
    // → w2 = w1 − c(doc 1)
    assert(QualityClassifier.fit(docs, QualityClassifier.enLabel, 2).toSeq ===
      Seq(-1000000L, -542857L, -400000L, 100000L, -31250L))
  }

  test("exactness is structural: training is invariant to partitioning " +
      "and repeatable") {
    val corpus = graft.Tables.load(spark, sfDir, "documents")
    def w(parts: Int) = QualityClassifier.fit(
      corpus.repartition(parts), QualityClassifier.enLabel, 3).toSeq
    assert(w(1) === w(7))
    assert(w(7) === w(7)) // no RNG, no order dependence
  }

  test("scoreWith: map-only margins + predictions under given weights") {
    val w = QualityClassifier.fit(docs, QualityClassifier.enLabel, 2).toIndexedSeq
    val out = QualityClassifier.scoreWith(docs, w, QualityClassifier.enLabel)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).toSeq
    // all-negative weights ⇒ both margins negative at this (oscillating)
    // step — the values are the contract, not the accuracy
    assert(out === Seq((0L, false, 1L), (1L, false, -1L)))
    // serving plan is a pure projection: no exchange, no aggregation
    val plan = QualityClassifier.scoreWith(docs, w, QualityClassifier.enLabel)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("HashAggregate"), s"serve is not map-only:\n$plan")
  }

  test("stateless serve applies to a STREAM unchanged, stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val w = QualityClassifier.fit(docs, QualityClassifier.enLabel, 2).toIndexedSeq
    val mem = MemoryStream[(Long, String, String)]
    val scored = QualityClassifier.scoreWith(
      mem.toDF().toDF("doc_id", "lang", "text"), w, QualityClassifier.enLabel)
    val q = scored.writeStream.format("memory").queryName("qc_serve")
      .outputMode("append").start()
    try {
      mem.addData((0L, "en", "the cat"), (1L, "de", "der hund!!"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qc_serve").orderBy("doc_id").collect()
      .map(_.toString).toSeq
    val batch = QualityClassifier.scoreWith(docs, w, QualityClassifier.enLabel)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(streamed === batch)
  }

  test("trained weights persist and reload through TrainedState, " +
      "serving from disk == serving from memory") {
    val w = QualityClassifier.fit(docs, QualityClassifier.enLabel, 2)
    val dir = java.nio.file.Files.createTempDirectory("qc_model").toString
    graft.similarity.TrainedState.saveLinearModel(spark, w.toIndexedSeq, dir)
    val loaded = graft.similarity.TrainedState.loadLinearModel(spark, dir)
    assert(loaded.toSeq === w.toSeq)
    assert(
      QualityClassifier.scoreWith(docs, loaded.toIndexedSeq,
        QualityClassifier.enLabel).orderBy("doc_id").collect().toSeq ===
      QualityClassifier.scoreWith(docs, w.toIndexedSeq,
        QualityClassifier.enLabel).orderBy("doc_id").collect().toSeq)
  }

  test("calibrationBins: hand-computed bins incl. negative margins") {
    import spark.implicits._
    // width 10: margins -15,-11 -> bin -2; -5 -> bin -1; 3,7 -> bin 0;
    // 23 -> bin 2. FLOOR binning (not truncation): -11 div 10 must land
    // in bin -2, the Spark-div-vs-DuckDB-// seam the offset closes.
    val scored = Seq(
      (1L, -15L, 1L), (2L, -11L, -1L), (3L, -5L, -1L),
      (4L, 3L, 1L), (5L, 7L, 1L), (6L, 23L, -1L)
    ).toDF("doc_id", "margin_e6", "y").repartition(2)
    val got = QualityClassifier.calibrationBins(scored, binWidth = 10L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (-2L, 2L, 1L, 500000L, -26L),
      (-1L, 1L, 0L, 0L, -5L),
      (0L, 2L, 2L, 1000000L, 10L),
      (2L, 1L, 0L, 0L, 23L)))
  }

  test("calibrationBins partitions the corpus scoring exactly") {
    val corpus = graft.Tables.load(spark, sfDir, "documents")
    val scored = QualityClassifier.score(corpus, QualityClassifier.enLabel, 2)
    val bins = QualityClassifier.calibrationBins(scored, 10000000L)
    assert(bins.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == corpus.count())
  }

  test("corpus fit separates en from the rest better than chance") {
    val corpus = graft.Tables.load(spark, sfDir, "documents")
    val w = QualityClassifier.fit(corpus, QualityClassifier.enLabel, 3)
    val scored = QualityClassifier.scoreWith(corpus, w.toIndexedSeq,
      QualityClassifier.enLabel)
    val n = scored.count()
    val correct = scored.filter(
      (col("pred_en") && col("y") === 1L) ||
        (!col("pred_en") && col("y") === -1L)).count()
    val majority = math.max(
      scored.filter(col("y") === 1L).count(),
      scored.filter(col("y") === -1L).count())
    assert(correct >= majority,
      s"classifier ($correct/$n) no better than majority ($majority/$n)")
  }
}
