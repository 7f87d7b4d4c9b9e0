package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class FwhtRotateSpec extends SparkTestBase {
  import spark.implicits._

  private val emb = "/root/testdata/sf0.01"

  test("kernel == independent reference implementation on real vectors") {
    val rows = Tables.load(spark, emb, "embeddings")
      .filter(col("vec_id") < 50)
      .select(col("embedding"),
        FwhtRotateExpr.fwht_rotate(col("embedding"), 64).as("r"))
      .collect()
    rows.foreach { row =>
      val x = row.getSeq[Float](0).toArray
      val got = row.getSeq[Float](1)
      val want = FwhtRotateExpr.rotateRef(x, 64).toSeq
      assert(got == want)
    }
  }

  test("rotation is orthogonal: dot products preserved to f32 rounding; " +
      "norm preserved; identical inputs rotate identically") {
    val rows = Tables.load(spark, emb, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("embedding"),
        FwhtRotateExpr.fwht_rotate(col("embedding"), 64).as("r"))
      .collect()
      .map(r => (r.getSeq[Float](0).map(_.toDouble).toArray,
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- rows.indices; j <- i until rows.length) {
      val orig = dot(rows(i)._1, rows(j)._1)
      val rot = dot(rows(i)._2, rows(j)._2)
      assert(math.abs(orig - rot) < 1e-3 * (1 + math.abs(orig)),
        s"pair ($i,$j): $orig vs $rot")
    }
  }

  test("width mismatch and non-power-of-two dims fail LOUDLY") {
    intercept[IllegalArgumentException] {
      FwhtRotateExpr.fwht_rotate(col("x"), 48)
    }
    val df = Seq(Tuple1(Seq(1f, 2f, 3f))).toDF("embedding")
    val e = intercept[Exception] {
      df.select(FwhtRotateExpr.fwht_rotate(col("embedding"), 4)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("fwht_rotate")), s"wrong error: $e")
  }

  test("rotated PQ: full rerank == rotated-space brute force; planted " +
      "identical vector ranks first at cosine 1") {
    val embDf = Tables.load(spark, emb, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = embDf.filter(col("vec_id") < 8)
    val n = embDf.count().toInt
    def rot(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      FwhtRotateExpr.fwht_rotate(col("embedding"), 64).as("embedding"))
    val got = graft.similarity.ProductQuantizer.topKRotated(queries, embDf,
      dim = 64, numSub = 8, k = 3, stride = 25, rerank = n)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("c")).collect().toSet
    val want = graft.similarity.Similarity.bruteTopK(rot(queries),
      rot(embDf), k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("c")).collect().toSet
    assert(got == want)

    val corpus = embDf.unionByName(queries
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding")))
    val top = graft.similarity.ProductQuantizer.topKRotated(queries, corpus,
      dim = 64, numSub = 8, k = 1, stride = 25, rerank = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    top.foreach { case (q, nb, cos) =>
      assert(nb == q + 5000L && math.abs(cos - 1.0) < 1e-9,
        s"query $q: expected planted dup, got ($nb, $cos)")
    }
  }
}
