package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class BinaryQuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("signBits packs exactly: hand vector, tail word, zero/negative " +
      "components clear") {
    // dim 40 -> words of 32 + 8: components 0, 33, 39 positive
    val v = Array.fill(40)(-1.0f)
    v(0) = 0.5f; v(33) = 2.0f; v(39) = 1e-9f
    v(5) = 0.0f // zero stays clear (strict >)
    val got = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
      .select(BinaryQuantize.signBits(col("embedding"), 40).as("b"))
      .head().getSeq[Long](0)
    assert(got == Seq(1L, (1L << 1) | (1L << 7)),
      s"got $got") // word 1: bits for components 33 (j=1) and 39 (j=7)
  }

  test("native kernels == declarative fold forms on real data, edge " +
      "widths, and degenerate inputs") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    for (dim <- Seq(64, 40, 3)) {
      val rows = emb.filter(col("vec_id") < 30)
        .select(BinaryQuantize.signBits(col("embedding"), dim).as("k"),
          BinaryQuantize.signBitsFold(col("embedding"), dim).as("f"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"kernel != fold at dim=$dim"))
    }
    val pairs = emb.filter(col("vec_id") < 20).select(col("vec_id"),
        BinaryQuantize.signBits(col("embedding"), 64).as("b"))
      .crossJoin(emb.filter(col("vec_id") >= 20 && col("vec_id") < 40)
        .select(BinaryQuantize.signBits(col("embedding"), 64).as("b2")))
      .select(BinaryQuantize.hammingWords(col("b"), col("b2")).as("k"),
        BinaryQuantize.hammingWordsFold(col("b"), col("b2")).as("f"))
      .collect()
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // degenerate: length mismatch -> NULL from both forms
    val mm = spark.sql(
      "SELECT 1").select(
      BinaryQuantize.hammingWords(
        typedLit(Seq(1L, 2L)), typedLit(Seq(1L))).as("k"),
      BinaryQuantize.hammingWordsFold(
        typedLit(Seq(1L, 2L)), typedLit(Seq(1L))).as("f")).head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
  }

  test("hamming over packed words == direct sign-disagreement count") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val rows = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"),
        BinaryQuantize.signBits(col("embedding"), 64).as("bits"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getSeq[Long](2)))
    for (a <- rows; b <- rows if a._1 < b._1) {
      val direct = a._2.zip(b._2).count { case (x, y) => (x > 0) != (y > 0) }
      val packed = a._3.zip(b._3)
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(direct == packed, s"pair (${a._1}, ${b._1})")
    }
  }

  test("full-width rerank degenerates to exact brute force; planted " +
      "identical vector is rank-1 at cosine 1") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val n = emb.count().toInt
    val got = BinaryQuantize.topKBinary(queries, emb, dim = 64, k = 3,
      rerank = n)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("c")).collect().toSet
    val want = Similarity.bruteTopK(queries, emb, k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("c")).collect().toSet
    assert(got == want)

    val corpus = emb.unionByName(queries
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding")))
    val top = BinaryQuantize.topKBinary(queries, corpus, dim = 64, k = 1,
      rerank = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    top.foreach { case (q, nb, cos) =>
      assert(nb == q + 5000L && math.abs(cos - 1.0) < 1e-9,
        s"query $q: expected planted dup at hamming 0, got ($nb, $cos)")
    }
  }
}
