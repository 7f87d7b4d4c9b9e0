package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {

  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(0.5f, -1.0f, 2.0f, 0.25f)),
    (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),     // zero vector
    (3L, Array(-3.5f, 0.001f, 127.0f, -0.5f))
  ).toDF("vec_id", "emb").repartition(2)

  test("codes bounded to [-127, 127]; zero vector → zero codes, scale 0") {
    val q = vecs.select(col("vec_id"), Quantize.quantizeInt8(col("emb")).as("q"))
      .select(col("vec_id"), col("q.scale").as("s"), col("q.codes").as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2)))
    q.foreach { case (_, _, c) =>
      assert(c.forall(v => v >= -127 && v <= 127), s"code out of range: $c")
    }
    val zero = q.find(_._1 == 2L).get
    assert(zero._2 == 0.0 && zero._3.forall(_ == 0L))
    // the max-magnitude element always maps to ±127 exactly
    assert(q.find(_._1 == 0L).get._3(2) == 127L)
    assert(q.find(_._1 == 3L).get._3(2) == 127L)
  }

  test("reconstruction error per element ≤ scale/2") {
    val rows = vecs
      .select(col("emb"), Quantize.quantizeInt8(col("emb")).as("q"))
      .select(col("emb"), col("q.scale").as("s"),
        Quantize.dequantize(col("q")).as("deq"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val deq = r.getSeq[Double](2)
      emb.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o.toDouble - d) <= s / 2 + 1e-12,
          s"error ${math.abs(o - d)} > scale/2 ${s / 2}")
      }
    }
  }

  test("dotInt8 approximates the float dot within the quantization bound") {
    val q = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id"), col("emb"),
        Quantize.quantizeInt8(col("emb")).as("q"))
    val a = q.filter(col("vec_id") === 0).select(col("emb").as("ea"), col("q").as("qa"))
    val b = q.filter(col("vec_id") === 1).select(col("emb").as("eb"), col("q").as("qb"))
    val r = a.crossJoin(b).select(
      Similarity.dot(col("ea"), col("eb")).as("fdot"),
      Quantize.dotInt8(col("qa"), col("qb")).as("qdot"),
      col("qa.scale").as("sa"), col("qb.scale").as("sb")).head
    val (fdot, qdot, sa, sb) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    // per-element error εa ≤ sa/2, εb ≤ sb/2; 4 elements, |a|,|b| ≤ 2
    val bound = 4 * (2.0 * sb / 2 + 2.0 * sa / 2 + sa * sb / 4)
    assert(math.abs(fdot - qdot) <= bound,
      s"|$fdot - $qdot| > $bound (sa=$sa sb=$sb)")
  }

  private def randomEmb(n: Int) = spark.range(n)
    .select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((pmod(xxhash64(col("id"), i), lit(1000)) - 500).cast("double")
          / 100.0).cast("float")).as("embedding"))
    .repartition(3)

  test("topKQuant == bruteTopK exactly when the coarse stage covers the " +
      "whole corpus (re-rank is the exact cosine)") {
    val corpus = randomEmb(60)
    val probes = corpus.filter(col("vec_id") < 3)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim") * 1e9).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // k·coarseFactor = 60 ≥ the 59 non-self candidates → no pruning
    assert(key(Quantize.topKQuant(probes, corpus, k = 4, coarseFactor = 15))
      == key(Similarity.bruteTopK(probes, corpus, 4)))
  }

  test("topKQuant: planted exact duplicate of the probe is rank 1 at cos 1") {
    val corpus = randomEmb(40).unionByName(
      randomEmb(40).filter(col("vec_id") === 7)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding")))
    val probes = corpus.filter(col("vec_id") === 7)
    val top = Quantize.topKQuant(probes, corpus, k = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(top.head._1 == 1 && top.head._2 == 1007L, top.mkString(","))
    assert(math.abs(top.head._3 - 1.0) < 1e-12, s"cos ${top.head._3}")
  }

  test("integer dots are exact and partition-invariant (no float-order drift)") {
    val df = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) - 500).cast("float") / 100f)
        .as("emb"))
    def dots(parts: Int) = df.repartition(parts)
      .select(col("vec_id"), Quantize.quantizeInt8(col("emb")).as("q"))
      .select(col("vec_id"), Quantize.dotCodes(col("q.codes"), col("q.codes"))
        .as("inorm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dots(1) == dots(7))
  }
}
