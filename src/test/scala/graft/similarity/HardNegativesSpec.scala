package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.hardNegatives]] — label-excluding top-k on hand
  * geometry, null-label hygiene, and the self/same-label exclusions. */
class HardNegativesSpec extends SparkTestBase {
  import spark.implicits._

  private def df(xs: (Long, Seq[Float], Option[String])*) =
    xs.toDF("vec_id", "embedding", "label").repartition(2)

  test("nearest different-label wins; same-label and self excluded") {
    val emb = df(
      (0L, Seq(1f, 0f), Some("A")),
      (1L, Seq(0.999f, 0.045f), Some("A")), // nearest overall — same label
      (2L, Seq(0.9f, 0.45f), Some("B")),    // nearest negative
      (3L, Seq(0f, 1f), Some("B")))
    val out = Similarity.hardNegatives(emb.filter(col("vec_id") === 0), emb, 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    assert(out === Seq((1, 2L, "B"), (2, 3L, "B")))
  }

  test("null labels are neither anchors nor negatives") {
    val emb = df(
      (0L, Seq(1f, 0f), Some("A")),
      (1L, Seq(1f, 0f), None),       // identical but unlabeled — excluded
      (2L, Seq(0.9f, 0.45f), Some("B")),
      (3L, Seq(0f, 1f), None))       // unlabeled anchor — no output rows
    val out = Similarity.hardNegatives(emb, emb, 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((0L, 2L), (2L, 0L)))
  }
}
