package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Matryoshka two-stage retrieval + kNN hubness diagnostics. */
class MrlSpec extends SparkTestBase {

  lazy val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")

  test("truncateDims keeps exactly the first dims components") {
    val t = Similarity.truncateDims(emb, 16)
    assert(t.filter(size(col("embedding")) =!= 16).count() == 0)
    // prefix identity: component i of the truncation == component i of
    // the original
    val j = t.select(col("vec_id"), col("embedding").as("pre"))
      .join(emb.select(col("vec_id"), col("embedding").as("full")), "vec_id")
      .filter(expr("exists(sequence(1, 16), i -> pre[i-1] <> full[i-1])"))
    assert(j.count() == 0)
  }

  test("mrlTopK degenerates to bruteTopK at shortlist = corpus size") {
    val qs = emb.filter(col("vec_id") < 5)
    val full = Similarity.bruteTopK(qs, emb, 3)
      .select("query_id", "rank", "neighbor_id").collect().toSet
    val mrl = Similarity.mrlTopK(qs, emb, k = 3, dims = 16,
        shortlist = emb.count().toInt)
      .select("query_id", "rank", "neighbor_id").collect().toSet
    assert(mrl == full)
  }

  test("mrlTopK reranks with FULL-dimension cosine") {
    val qs = emb.filter(col("vec_id") < 5)
    val got = Similarity.mrlTopK(qs, emb, k = 3, dims = 16, shortlist = 10)
    // every returned cos_sim must equal the full-dim cosine of that pair
    val check = got.join(
        qs.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
        "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), "neighbor_id")
      .filter(col("cos_sim") =!= Similarity.cosine(col("qe"), col("ce")))
    assert(check.count() == 0)
    assert(got.count() == 15) // 5 queries x top-3
  }

  test("knnInDegree counts arrivals, keeps zero-degree nodes AND " +
      "retrieved-but-never-querying nodes") {
    import spark.implicits._
    // hand graph: 1->2, 1->3, 2->3, 3->2, 2->9 ; node 1 is never a
    // neighbor (degree 0); node 9 never queries (the knnGraph
    // only-itself-in-cell convention) yet IS retrieved — a query-side
    // node set would drop it with its nonzero degree
    val g = Seq((1L, 1, 2L), (1L, 2, 3L), (2L, 1, 3L), (3L, 1, 2L),
        (2L, 2, 9L))
      .toDF("query_id", "rank", "neighbor_id").repartition(2)
    val got = Similarity.knnInDegree(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 2L, 9L -> 1L))
  }
}
