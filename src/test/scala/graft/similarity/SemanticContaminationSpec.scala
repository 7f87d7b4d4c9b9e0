package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.semanticContamination]] — hand geometry plus a
  * full-data cross-check against the join+window formulation. */
class SemanticContaminationSpec extends SparkTestBase {
  import spark.implicits._

  private def df(xs: (Long, Seq[Float])*) =
    xs.toDF("vec_id", "embedding").repartition(2)

  test("hand geometry: nearest ids, thresholds, and the earliest-id " +
      "tie-break") {
    val corpus = df(
      0L -> Seq(1f, 0f),           // dup of eval 100
      1L -> Seq(0f, 1f),           // dup of eval 101
      2L -> Seq(0.9f, 0.45f),      // cos≈0.894 to 100 — below 0.9
      3L -> Seq(1f, 1f))           // cos≈0.707 to BOTH → tie → id 100
    val eval = df(100L -> Seq(1f, 0f), 101L -> Seq(0f, 1f))
    val out = Similarity.semanticContamination(corpus, eval, 0.9)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    assert(out === Seq(
      (0L, 100L, true), (1L, 101L, true),
      (2L, 100L, false), (3L, 100L, false)))
  }

  test("matches the join+window formulation on real embeddings " +
      "(ids exact, cosines to 1e-12)") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val eval = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
    val corpus = emb.filter(pmod(col("vec_id"), lit(97)) =!= 0)
    val got = Similarity.semanticContamination(corpus, eval, 0.45)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val refRows = corpus.select(col("vec_id").as("cid"),
        col("embedding").as("c_emb"))
      .crossJoin(broadcast(eval.select(col("vec_id").as("eid"),
        col("embedding").as("e_emb"))))
      .withColumn("cos", Similarity.cosine(col("c_emb"), col("e_emb")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
          .orderBy(col("cos").desc, col("eid"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("eid"), col("cos"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === refRows.keySet)
    got.foreach { case (id, (nid, c)) =>
      val (rnid, rc) = refRows(id)
      assert(nid === rnid, s"nearest id diverged for $id")
      assert(math.abs(c - rc) < 1e-12, s"cos diverged for $id: $c vs $rc")
    }
  }

  test("guards: empty eval set and oversized eval set reject") {
    val corpus = df(0L -> Seq(1f, 0f))
    intercept[IllegalArgumentException](
      Similarity.semanticContamination(corpus, corpus.filter(lit(false)), 0.5))
    intercept[IllegalArgumentException](
      Similarity.semanticContamination(corpus, corpus, 0.5, maxEvalRows = 0))
  }
}
