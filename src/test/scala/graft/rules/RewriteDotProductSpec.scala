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
