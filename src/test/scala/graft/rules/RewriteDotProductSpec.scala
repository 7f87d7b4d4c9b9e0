package graft.rules

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.similarity.Similarity

class RewriteDotProductSpec extends SparkTestBase {

  test("fold-shaped dot product is rewritten to the native kernel") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
      val df = emb.select(col("vec_id"),
        Similarity.dotFold(col("embedding"), col("embedding")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_product"),
        s"rewrite did not fire:\n$optimized")
      // and values equal the native kernel's
      val native = emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"))
      assert(df.exceptAll(native).count() == 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }

  test("rewrite preserves the fold's null semantics on degenerate arrays") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val df = Seq[(Long, Array[java.lang.Float], Array[java.lang.Float])](
        (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)),
        (2L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)), // length mismatch
        (3L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)), // null element
        (4L, null, Array[java.lang.Float](3.0f, 4.0f)) // null array
      ).toDF("id", "a", "b")
        .repartition(2) // keep it plan-shaped: ConvertToLocalRelation would
                        // otherwise eval the projection eagerly
      val rewritten = df.select(col("id"),
        Similarity.dotFold(col("a"), col("b")).as("d"))
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("dot_product"))
      val got = rewritten.collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(got(1L).contains(11.0))
      assert(got(2L).isEmpty, "length mismatch must be NULL like the fold")
      assert(got(3L).isEmpty, "null element must be NULL like the fold")
      assert(got(4L).isEmpty, "null array must be NULL")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }

  test("non-matching folds are left alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val emb = Tables.load(spark, sfDir, "embeddings").limit(10)
      // sum fold (not a dot product) must not be rewritten
      val df = emb.select(
        aggregate(col("embedding"), lit(0.0),
          (acc, v) => acc + v.cast("double")).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product"))
      assert(df.count() == 10)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }
}
