package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.similarity.Similarity

class SkewJoinSpec extends SparkTestBase {

  test("salted inner join equals plain inner join") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val su = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = li.join(su, Seq("l_suppkey"))
    val salted = SkewJoin.saltedInnerJoin(li, su, Seq("l_suppkey"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted sum aggregation equals plain aggregation") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_suppkey", "l_quantity")
    val plain = li.groupBy("l_suppkey")
      .agg(sum("l_quantity").as("want"))
    val salted = SkewJoin.saltedSumAgg(li, Seq("l_suppkey"), Seq("l_quantity"), 8)
    assert(salted.count() == plain.count())
    val diff = plain.join(salted, "l_suppkey")
      .filter(abs(col("want") - col("sum_l_quantity")) > 1e-6)
    assert(diff.count() == 0)
  }

  test("IVF with full probe equals brute force exactly") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    // stride 50 → 10 centroids at sf0.001; probing all 10 = exhaustive
    val brute = Similarity.bruteTopK(queries, emb, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val ivf = Similarity.ivfTopK(queries, emb, 3,
      centroidStride = 50, nprobe = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }

  test("IVF with narrow probe returns plausible subset") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val ivf = Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb, 3,
      centroidStride = 50, nprobe = 2)
    assert(ivf.count() > 0)
    assert(ivf.filter(col("rank") > 3).count() == 0)
  }

  test("k-means centroids train declaratively and plug into IVF") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = graft.similarity.KMeans.fit(emb, k = 8, iters = 2)
    val got = centroids.collect()
    assert(got.length == 8)
    assert(got.forall(_.getSeq[Float](1).length == 64))
    // trained cells serve IVF queries
    val ivf = Similarity.ivfTopKWith(emb.filter(col("vec_id") < 3), emb, 3,
      centroids, nprobe = 3)
    assert(ivf.count() == 9)
    // assignment partitions the corpus completely
    val assigned = graft.similarity.KMeans.assign(emb, centroids)
    assert(assigned.count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() <= 8)
  }
}
